package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.tableParallel
import graft.functions.TextOps.tokens

/** Independent cross-checks for the selection/layout additions
  * (q186/q187/q190/q191): the pareto window algorithm against the O(n²)
  * dominance DEFINITION, the compaction plan's packing invariants, the
  * manifest fingerprint's change sensitivity, and the quality rollup's
  * internal consistency.
  */
class SelectionLayoutSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("q186 frontier equals the brute-force dominance skyline") {
    val pts = tableParallel(spark, sf, "documents")
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("toks"),
        size(array_distinct(col("ws"))).cast("long").as("uniq"))
      .withColumn("uniq_bp", expr("uniq * 10000 DIV toks"))
      .select("doc_id", "toks", "uniq_bp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the definition: p is on the frontier iff NO q strictly dominates it
    val expected = pts.filter { case (_, t, u) =>
      !pts.exists { case (_, t2, u2) =>
        t2 >= t && u2 >= u && (t2 > t || u2 > u)
      }
    }.map(_._1).toSet
    val got = SparkEntry.queries("q186_pareto_frontier")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"window skyline $got != brute-force skyline $expected")
  }

  test("q187 bins are contiguous, complete, and size-bounded") {
    val target = 2048L
    val files = tableParallel(spark, sf, "documents")
      .groupBy(col("source"), expr("doc_id DIV 25").as("file_id"))
      .agg(sum("n_chars").as("bytes"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val maxFile = files.map(_._3).max
    val nFiles = files.groupBy(_._1).view.mapValues(_.size).toMap
    val plan = SparkEntry.queries("q187_compaction_plan")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    plan.groupBy(_._1).foreach { case (src, bins0) =>
      val bins = bins0.sortBy(_._2)
      // complete: every file appears in exactly one bin
      assert(bins.map(_._3).sum == nFiles(src),
        s"$src: bin file counts don't sum to the inventory")
      // contiguous in file order: each bin starts where the last ended
      bins.toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b._5 == a._6 + 1,
            s"$src: bin ${b._2} starts at ${b._5}, prev ended at ${a._6}")
        case _ =>
      }
      assert(bins.head._5 == files.filter(_._1 == src).map(_._2).min)
      // bounded: a bin exceeds target only by the straddling file
      bins.foreach { b =>
        assert(b._4 < target + maxFile,
          s"$src bin ${b._2}: ${b._4} bytes ≥ target + max file $maxFile")
      }
    }
  }

  test("q191 fingerprint flips on a content-only change, nothing else") {
    val docs = tableParallel(spark, sf, "documents")
    val victim = docs.select(min("doc_id")).head().getLong(0)
    val vicSrc = docs.filter(col("doc_id") === victim)
      .select("source").head().getString(0)
    // append one char to ONE doc's text; n_chars deliberately untouched —
    // only the content hash can see this change
    val mutated = docs.withColumn("text",
      when(col("doc_id") === victim, concat(col("text"), lit("X")))
        .otherwise(col("text")))
    val base = TrainingQueries.manifestOf(docs).collect()
      .map(r => r.getString(0) -> r.toSeq).toMap
    val after = TrainingQueries.manifestOf(mutated).collect()
      .map(r => r.getString(0) -> r.toSeq).toMap
    assert(base.keySet == after.keySet)
    base.keySet.foreach { src =>
      if (src == vicSrc) {
        assert(base(src).last != after(src).last,
          s"$src: fp did not flip on a content change")
        assert(base(src).init == after(src).init,
          s"$src: non-fp manifest columns changed")
      } else assert(base(src) == after(src), s"$src: unrelated row changed")
    }
  }

  test("manifest row hash distinguishes NULL fields from empty ones and " +
      "never drops a null-field row") {
    import spark.implicits._
    import graft.operators.Manifest
    def fp(lang: String): Long =
      Manifest.manifest(Seq((1L, "body", lang, 4L, "s0"))
          .toDF("doc_id", "text", "lang", "n_chars", "source"))
        .collect().head.getAs[Long]("fp")
    val (nullFp, emptyFp, realFp) = (fp(null), fp(""), fp("en"))
    // concat_ws would have skipped the null field, making NULL hash like
    // '' AND (with a null text) dropping the row from the Σ entirely
    assert(nullFp != emptyFp, "NULL lang hashes identically to empty")
    assert(nullFp != realFp && emptyFp != realFp)
  }

  test("q194 manifest pruning loses no changes vs the unpruned full diff") {
    import graft.operators.SnapshotDiff
    val base = tableParallel(spark, sf, "documents")
      .select("doc_id", "source", "lang", "n_chars", "text")
    val old = base
      .filter(!(col("source") === "src5" && col("doc_id") % 13 === 0))
      .withColumn("text",
        when(col("source") === "src3" && col("doc_id") % 7 === 0,
          concat(col("text"), lit("X"))).otherwise(col("text")))
    val cur = base
      .filter(!(col("source") === "src7" && col("doc_id") % 17 === 0))
    val full = SnapshotDiff.diff(old, cur, Seq("doc_id"))
      .filter(col("change_type") =!= "unchanged")
      .groupBy("source", "change_type").count()
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(full.nonEmpty, "fixture must plant changes at this sf")
    val out = SparkEntry.queries("q194_manifest_pruned_diff")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val got = out.filter(r => r._1 != "_pruning" && r._2 != "unchanged")
      .toSet
    assert(got == full,
      s"pruned diff $got != unpruned non-unchanged classes $full")
    // and the pruning really pruned: fewer partitions row-diffed than exist
    val pruning = out.filter(_._1 == "_pruning")
      .map(r => r._2 -> r._3).toMap
    assert(pruning("partitions_row_diffed") < pruning("partitions_total"))
  }

  test("q195 stages are balanced and quality-ordered") {
    val rows = SparkEntry.queries("q195_curriculum_stages")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to rows.length))
    // ntile balance: stage sizes differ by at most one
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
    // clean-first ordering: every doc in stage k scores >= every doc in
    // stage k+1, so the stage AVERAGES are non-increasing
    // (cross-multiplied to stay in exact integer arithmetic)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._3 * b._2 >= b._3 * a._2,
          s"stage ${b._1} average score exceeds stage ${a._1}'s")
      case _ =>
    }
    // total coverage and the share bound
    val n = tableParallel(spark, sf, "documents").count()
    assert(rows.map(_._2).sum == n)
    rows.foreach { case (st, nd, _, nsrc, share) =>
      assert(nsrc >= 1 && share >= 10000 / nd.max(1) && share <= 10000,
        s"stage $st: implausible share $share")
    }
  }

  test("q197 rendezvous moves a small fraction where mod moves nearly all") {
    val rows = SparkEntry.queries("q197_shard_rebalance_audit")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val (modBp, rdvBp) = (rows("mod")._3, rows("rendezvous")._3)
    // theory: mod ~ 39/40 moved, rendezvous ~ 2/10 — the audit must show
    // the structural gap, not just any difference
    assert(rdvBp < 4000, s"rendezvous moved $rdvBp bp — expected ~2000")
    assert(modBp > 7000, s"mod moved only $modBp bp — expected ~9750")
    assert(rdvBp * 2 < modBp)
    rows.values.foreach { case (n, moved, _, share) =>
      assert(moved <= n && share >= 1000,
        "10-shard max share below the uniform floor")
    }
  }

  test("q190 rollup row is consistent with the per-source rows") {
    val rows = SparkEntry.queries("q190_quality_filter_audit")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val (all, per) = rows.partition(_._1 == "ALL")
    assert(all.length == 1 && per.nonEmpty)
    assert(all.head._2 == per.map(_._2).sum, "ALL n_docs != Σ per-source")
    assert(all.head._3 == per.map(_._3).sum, "ALL n_pass != Σ per-source")
    assert(all.head._5 == per.map(_._5).sum, "ALL sum_score != Σ")
    rows.foreach { case (src, n, p, bp, _) =>
      assert(p >= 0 && p <= n)
      assert(bp == p * 10000 / n, s"$src: pass_bp inconsistent")
    }
  }
}
