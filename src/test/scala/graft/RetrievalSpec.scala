package graft

import org.apache.spark.sql.execution.window.WindowExec

import graft.operators.Retrieval

/** BM25 retrieval: exact parity with an in-JVM brute-force model (the
  * per-term expression is the same IEEE double chain, so score_units
  * must match bit-for-bit), selection/tie-break determinism, and the
  * window-free plan guarantee (q278 certifies the same chain against
  * DuckDB from first principles). */
class RetrievalSpec extends SparkSpec {
  import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}

  private val corpus = Seq(
    (0L, "hash join fast"),
    (1L, "sort merge join join"),
    (2L, "window agg stream window"),
    (3L, "hash hash hash scan"),
    (4L, "scan filter"),
    (5L, "join"),
    (6L, "agg sort"))

  /** The operator's exact double chain, replayed sequentially. */
  private def model(queries: Seq[(Long, String)], k: Int,
      k1: Double = 1.2, b: Double = 0.75): Seq[(Long, Long, Long, Long)] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.trim.split("\\s+").toSeq
    }.toMap
    val n = corpus.length
    val dl = toks.map { case (id, ts) => id -> ts.length }
    val avgdl = dl.values.sum.toDouble / n.toDouble
    val tf = toks.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, g) => (id, t) -> g.length }
    }
    val dfreq = tf.keys.groupBy(_._2).map { case (t, g) => t -> g.size }
    val perDoc = for {
      (qid, q) <- queries
      terms = q.trim.split("\\s+").filter(_.nonEmpty).distinct
      (docId, _) <- corpus
      s = terms.flatMap { t =>
        tf.get((docId, t)).map { f =>
          val df = dfreq(t)
          val idf = math.log(1.0 +
            (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5))
          val tfn = (f.toDouble * (k1 + 1.0)) /
            (f.toDouble + k1 *
              ((1.0 - b) + b * (dl(docId).toDouble / avgdl)))
          BigDecimal(idf * tfn)
            .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }
      }
      if s.nonEmpty
    } yield (qid, docId,
      (s.sum * BigDecimal(10).pow(12)).toLongExact)
    perDoc.groupBy(_._1).toSeq.flatMap { case (qid, ds) =>
      ds.sortBy { case (_, id, u) => (-u, id) }.take(k).zipWithIndex
        .map { case ((_, id, u), i) => (qid, i + 1L, id, u) }
    }.sortBy(t => (t._1, t._2))
  }

  test("bm25TopK matches the sequential model bit-for-bit " +
      "(score_units), ranks by score desc with doc-id ties, and only " +
      "returns docs sharing a query term") {
    val queries = Seq(0L -> "hash join", 1L -> "scan", 2L -> "join sort")
    val got = Retrieval.bm25TopK(
        corpus.toDF("doc_id", "text").repartition(3),
        "doc_id", "text", queries, k = 4)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("score_units")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got === model(queries, k = 4))
    // doc 2 shares no term with any query — must never appear
    assert(!got.exists(_._3 === 2L))
    // score round-trips from the integer witness
    got.foreach { case (_, _, _, u) => assert(u > 0L) }
  }

  test("bm25TopK caps at k, plans no window, and rejects empty input") {
    val out = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"),
      "doc_id", "text", Seq(0L -> "join hash scan sort"), k = 2)
    assert(out.collect().length === 2)
    assert(out.queryExecution.executedPlan.collect {
      case w: WindowExec => w
    }.isEmpty, "per-query top-k must be the partial-merging heap")
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), "doc_id", "text",
        Seq.empty, k = 2)
    }
    assert(e.getMessage.contains("empty query set"))
  }

  test("rrfFuse matches the packed-integer model: units sum, coverage " +
      "tie-break, id tie-break, one-sided ids fuse with sides_hit=1") {
    // qid 0 certifies the exact unit arithmetic and two-sides-beat-one
    // ordering; qid 1 certifies the id-asc tie-break on equal units AND
    // equal coverage (the coverage tie-break itself is pinned in the
    // next test, where c=0 makes equal-units-different-coverage
    // constructible: 2·u(2) = u(1) exactly).
    val lex = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L),
      (1L, 20L, 1L), (1L, 21L, 2L)).toDF("qid", "id", "rank")
    val den = Seq((0L, 10L, 2L), (0L, 13L, 1L), (0L, 12L, 3L),
      (1L, 22L, 1L)).toDF("qid", "id", "rank")
    val got = Retrieval.rrfFuse(Seq(lex, den), "qid", "id", "rank", k = 3)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"),
        r.getAs[Long]("id"), r.getAs[Long]("rrf_units"),
        r.getAs[Long]("sides_hit")))
      .sortBy(t => (t._1, t._2)).toSeq
    def u(r: Long) = 1000000000000L / (60L + r)
    // qid 0 fused units: 10 -> u(1)+u(2) two sides; 13 -> u(1); 11 ->
    // u(2); 12 -> u(3)+u(3) two sides (a TRUE full tie with nothing:
    // unique units here; id order certified on qid 1 below)
    assert(got.filter(_._1 == 0L) === Seq(
      (0L, 1L, 10L, u(1) + u(2), 2L),
      (0L, 2L, 12L, u(3) + u(3), 2L),
      (0L, 3L, 13L, u(1), 1L)))
    // qid 1: 20 and 22 both rank 1 on exactly one side — equal units,
    // equal coverage -> id ascending breaks the tie
    assert(got.filter(_._1 == 1L) === Seq(
      (1L, 1L, 20L, u(1), 1L),
      (1L, 2L, 22L, u(1), 1L),
      (1L, 3L, 21L, u(2), 1L)))
  }

  test("rrfFuse prefers coverage on equal units, plans no window, and " +
      "rejects bad inputs") {
    // c=0: u(r) = 1e12 div r, so {rank 2} twice = 2*u(2) = u(1) = 1e12
    // exactly — equal fused units, different coverage: 2 sides wins
    val a = Seq((0L, 1L, 2L)).toDF("qid", "id", "rank")
    val b = Seq((0L, 1L, 2L), (0L, 2L, 1L)).toDF("qid", "id", "rank")
    val tied = Retrieval.rrfFuse(Seq(a, b), "qid", "id", "rank",
        k = 2, c = 0L)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("id"),
        r.getAs[Long]("rrf_units"), r.getAs[Long]("sides_hit")))
      .sortBy(_._1).toSeq
    assert(tied === Seq((1L, 1L, 1000000000000L, 2L),
      (2L, 2L, 1000000000000L, 1L)))
    assert(Retrieval.rrfFuse(Seq(a, b), "qid", "id", "rank", k = 2)
      .queryExecution.executedPlan.collect {
        case w: WindowExec => w
      }.isEmpty, "fusion top-k must be the partial-merging heap")
    val zeroRank = Seq((0L, 1L, 0L)).toDF("qid", "id", "rank")
    val e = intercept[Exception] {
      Retrieval.rrfFuse(Seq(zeroRank), "qid", "id", "rank", k = 1)
        .collect()
    }
    assert(e.getMessage.contains("1-based"))
    assert(intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq.empty, "qid", "id", "rank", k = 1)
    }.getMessage.contains("empty side list"))
    assert(intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq.fill(8)(a), "qid", "id", "rank", k = 1)
    }.getMessage.contains("max 7"),
      "8 sides must be rejected: coverage is packed mod 8")
  }

  test("rrfFuse raises on a duplicate (qid,id) WITHIN one side but " +
      "still fuses the same id across different sides") {
    val dup = Seq((0L, 1L, 1L), (0L, 1L, 3L)).toDF("qid", "id", "rank")
    val e = intercept[Exception] {
      Retrieval.rrfFuse(Seq(dup), "qid", "id", "rank", k = 2).collect()
    }
    assert(e.getMessage.contains("duplicate (qid,id) within one side"))
    // the legitimate case — same id ranked by BOTH sides — must keep
    // fusing (that is the whole point of RRF), so the check can't be
    // a blanket count-per-(qid,id)
    val a = Seq((0L, 1L, 1L)).toDF("qid", "id", "rank")
    val b = Seq((0L, 1L, 2L)).toDF("qid", "id", "rank")
    val ok = Retrieval.rrfFuse(Seq(a, b), "qid", "id", "rank", k = 1)
      .collect()
    assert(ok.length === 1 && ok.head.getAs[Long]("sides_hit") === 2L)
  }

  test("evalAtK matches the hand model: ln-discount DCG units, ideal " +
      "ranking with grade/id ties, MRR/precision/recall, cutoff at k") {
    val run = Seq((0L, 1L, 1L), (0L, 5L, 2L), (0L, 3L, 3L),
      (0L, 2L, 4L)).toDF("qid", "id", "rank") // rank 4 is outside k=3
    val rel = Seq((0L, 1L, 3L), (0L, 2L, 1L), (0L, 3L, 2L),
      (0L, 9L, 1L)).toDF("qid", "id", "grade")
    val got = Retrieval.evalAtK(run, rel, k = 3).collect()
    assert(got.length === 1)
    val r = got.head
    def units(terms: Seq[(Long, Long)]): Long = // (grade, rank)
      terms.map { case (g, rk) =>
        BigDecimal(((1L << g) - 1).toDouble / math.log(rk + 1.0))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum.*(BigDecimal(10).pow(12)).toLongExact
    // hits@3: id 1 (g3, r1) and id 3 (g2, r3); id 5 unjudged, id 2 cut
    val dcg = units(Seq((3L, 1L), (2L, 3L)))
    // ideal: g3@1, g2@2, then the g1 tie breaks to id 2 over id 9
    val idcg = units(Seq((3L, 1L), (2L, 2L), (1L, 3L)))
    assert(r.getAs[Long]("hits") === 2L)
    assert(r.getAs[Long]("rel_total") === 4L)
    assert(r.getAs[Long]("dcg_units") === dcg)
    assert(r.getAs[Long]("idcg_units") === idcg)
    assert(r.getAs[Double]("ndcg") ===
      math.rint(dcg.toDouble / idcg.toDouble * 1e6) / 1e6)
    assert(r.getAs[Long]("mrr_units") === 1000000000000L)
    assert(r.getAs[Double]("precision") === 0.666667)
    assert(r.getAs[Double]("recall") === 0.5)
  }

  test("evalAtK emits the zero row for a query with no judged doc in " +
      "its top-k instead of dropping it") {
    val run = Seq((0L, 1L, 1L), (7L, 50L, 1L)).toDF("qid", "id", "rank")
    val rel = Seq((0L, 1L, 2L), (7L, 99L, 3L)).toDF("qid", "id", "grade")
    val got = Retrieval.evalAtK(run, rel, k = 3).collect()
      .map(r => r.getAs[Long]("qid") ->
        (r.getAs[Long]("hits"), r.getAs[Long]("dcg_units"),
          r.getAs[Long]("mrr_units"), r.getAs[Double]("ndcg"),
          r.getAs[Double]("precision"), r.getAs[Double]("recall")))
      .toMap
    assert(got.keySet === Set(0L, 7L))
    // qid 7 retrieved doc 50 but only doc 99 is judged: the zero row
    assert(got(7L) === ((0L, 0L, 0L, 0.0, 0.0, 0.0)))
    assert(got(0L)._1 === 1L && got(0L)._4 === 1.0)
  }

  test("evalAtK raises on out-of-contract grades and rejects k <= 0") {
    val run = Seq((0L, 1L, 1L)).toDF("qid", "id", "rank")
    def relWith(g: Long) = Seq((0L, 1L, g)).toDF("qid", "id", "grade")
    for (bad <- Seq(0L, 31L)) {
      val e = intercept[Exception] {
        Retrieval.evalAtK(run, relWith(bad), k = 3).collect()
      }
      assert(e.getMessage.contains("grade outside 1..30"))
    }
    assert(intercept[IllegalArgumentException] {
      Retrieval.evalAtK(run, relWith(1L), k = 0)
    }.getMessage.contains("k=0"))
  }

  test("evalAtK raises on duplicate (qid,id) in rel or within the " +
      "ranked cutoff; a duplicate OUTSIDE the cutoff is harmless") {
    val run = Seq((0L, 1L, 1L), (0L, 2L, 2L)).toDF("qid", "id", "rank")
    val rel = Seq((0L, 1L, 2L)).toDF("qid", "id", "grade")
    val dupRel = Seq((0L, 1L, 2L), (0L, 1L, 1L)).toDF("qid", "id", "grade")
    assert(intercept[Exception] {
      Retrieval.evalAtK(run, dupRel, k = 3).collect()
    }.getMessage.contains("duplicate (qid,id) in rel"))
    val dupRun = Seq((0L, 1L, 1L), (0L, 1L, 2L)).toDF("qid", "id", "rank")
    assert(intercept[Exception] {
      Retrieval.evalAtK(dupRun, rel, k = 3).collect()
    }.getMessage.contains("duplicate (qid,id) within the cutoff"))
    // the same id re-appearing BEYOND rank k never reaches the hits
    // join, so it must not trip the contract
    val dupBeyond = Seq((0L, 1L, 1L), (0L, 1L, 9L)).toDF("qid", "id", "rank")
    val row = Retrieval.evalAtK(dupBeyond, rel, k = 3).collect()
    assert(row.length === 1 && row.head.getAs[Long]("hits") === 1L)
  }
  test("bm25PrfTopK: expansion retrieves vocabulary-mismatched docs, " +
      "ties in RM1 weight break by term ascending, originals are no-ops") {
    // corpus: doc 0 is the only 'alpha' match and becomes the whole
    // feedback set; its RM1 weights tie at 1/3 for alpha/beta/gamma,
    // so the ascending tie-break makes fbTerms=2 pick {alpha, beta} —
    // beta is the one EFFECTIVE expansion term (alpha re-selects the
    // original), and fbTerms=3 adds gamma
    val c2 = Seq((0L, "alpha beta gamma"), (3L, "beta beta"),
      (4L, "gamma gamma")).toDF("doc_id", "text")
    val q = Seq(0L -> "alpha")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getAs[Long]("doc_id")).toSet
    val plain = ids(Retrieval.bm25TopK(c2, "doc_id", "text", q, k = 5))
    assert(plain === Set(0L), "only doc 0 contains an original term")
    val exp2 = ids(Retrieval.bm25PrfTopK(c2, "doc_id", "text", q,
      k = 5, fbDocs = 1, fbTerms = 2))
    assert(exp2 === Set(0L, 3L),
      "fbTerms=2 must pick {alpha, beta} by the ascending tie-break")
    val exp3 = ids(Retrieval.bm25PrfTopK(c2, "doc_id", "text", q,
      k = 5, fbDocs = 1, fbTerms = 3))
    assert(exp3 === Set(0L, 3L, 4L), "fbTerms=3 adds gamma")
    assert(intercept[IllegalArgumentException] {
      Retrieval.bm25PrfTopK(c2, "doc_id", "text", q, k = 5, fbDocs = 0)
    }.getMessage.contains("fbDocs"))
    assert(intercept[IllegalArgumentException] {
      Retrieval.bm25PrfTopK(c2, "doc_id", "text", q, k = 5, fbTerms = 0)
    }.getMessage.contains("fbTerms"))
  }
}
