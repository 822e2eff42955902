package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  test("lang-id scores every doc; this all-English-vocab corpus → en") {
    val rows = TextQueries.textLangId(spark, dir).collect()
    assert(rows.length === 500)
    // the synthetic corpus draws every doc from one English-ish vocab,
    // whatever its lang label says — a correct stopword voter says 'en'
    assert(rows.forall(r => Set("en", "unknown")(r.getString(2))))
    assert(rows.count(_.getString(2) == "en") > 450)
  }

  test("quality metrics are internally consistent") {
    val rows = TextQueries.textQuality(spark, dir).collect()
    rows.foreach { r =>
      val (chars, toks) = (r.getInt(1), r.getInt(2))
      assert(toks >= 1 && chars >= toks * 2 - 1) // words >=1 char + separators
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("token counters agree where they should") {
    val df = TextQueries.textTokens(spark, dir)
    // all-lowercase alpha corpus: alpha runs == whitespace tokens
    assert(df.filter(col("ws_tokens") =!= col("alpha_tokens")).count() === 0)
    // bpe estimate >= token count (every word is >=1 subword)
    assert(df.filter(col("bpe_est") < col("ws_tokens")).count() === 0)
  }

  test("BM25: top-10 ranked by quantized score; idf orders rare above common") {
    val rows = TextQueries.textBm25(spark, dir).collect()
    assert(rows.length === 10)
    val scores = rows.map(_.getLong(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(_ > 0L))
    // every winner matched at least one of the query terms
    assert(rows.forall(r => r.getLong(2) >= 1L && r.getLong(2) <= 3L))
  }

  test("repetition signals stay in [0,1]; small-vocab corpus reads as " +
    "repetitive") {
    val rows = TextQueries.textRepetition(spark, dir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
      // top bigram can repeat at most every other position
      assert(r.getLong(3) <= (r.getLong(1) + 1) / 2)
    }
    // ~30-word vocabulary over 25-80-word docs: duplicate-word fraction
    // must read high — the signal a Gopher-style filter thresholds on
    assert(rows.map(_.getDouble(2)).max > 0.5)
  }

  test("textrank keywords: deterministic, damped floor holds, and " +
    "centrality is not a frequency re-sort") {
    val a = TextQueries.textTextrank(spark, dir).collect()
    graft.CachedFrames.releaseAll()
    val b = TextQueries.textTextrank(spark, dir).collect()
    graft.CachedFrames.releaseAll()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.nonEmpty && a.length <= TextQueries.TextRankTopN)
    // every node keeps at least the damping floor 0.15e6
    assert(a.forall(_.getLong(2) >= 150000L))
    // emitted in rank order, word-tiebroken
    val keys = a.map(r => (-r.getLong(2), r.getString(0))).toSeq
    assert(keys === keys.sorted)
    // the ranking must disagree with raw co-occurrence mass somewhere
    // (otherwise the iteration added nothing over counting)
    val byMass = a.sortBy(r => (-r.getLong(1), r.getString(0))).map(_.getString(0))
    assert(byMass.toSeq !== a.map(_.getString(0)).toSeq,
      "textrank order identical to frequency order — iteration inert?")
  }

  test("Jelinek-Mercer interpolation beats add-one bigram smoothing " +
    "on held-out NLL, over identical pairs") {
    val jm = TextQueries.textPerplexityJm(spark, dir).collect()
    graft.CachedFrames.releaseAll()
    val laplace = TextQueries.textPerplexity(spark, dir).collect()
    graft.CachedFrames.releaseAll()
    // identical held-out docs and pair counts (same split, same bigrams)
    val jmByDoc = jm.map(r => r.getLong(0) -> r).toMap
    assert(jm.length === laplace.length)
    laplace.foreach { l =>
      val j = jmByDoc(l.getLong(0))
      assert(j.getLong(1) === l.getLong(1), "pair counts diverged")
      assert(j.getLong(2) === l.getLong(2), "unseen counts diverged")
    }
    // the smoothing claim, in aggregate: total held-out NLL mass is
    // strictly lower under JM (per-doc means weighted by pair counts)
    def mass(rows: Array[org.apache.spark.sql.Row]): Long =
      rows.map(r => r.getLong(3) * r.getLong(1)).sum
    assert(mass(jm) < mass(laplace),
      s"JM ${mass(jm)} did not beat Laplace ${mass(laplace)}")
  }

  test("winnowing fingerprints: near-dup docs share most fingerprints") {
    val fp = TextQueries.textFingerprint(spark, dir)
      .select("doc_id", "n_fp").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp.size === 500)
    assert(fp.values.forall(n => n >= 1))
    // winnowing compresses: far fewer fingerprints than shingles
    val nShingles = graft.dedup.Shingling
      .shingles(graft.Tables.documents(spark, dir)).count()
    assert(fp.values.sum < nShingles)
  }
}
