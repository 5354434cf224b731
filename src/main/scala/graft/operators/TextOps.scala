package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Training-data-pipeline text operators over the `documents` table:
  * exact + near dedup, fingerprinting, token/quality stats, language ID.
  *
  * Scale notes (100 TB design):
  *  - exact dedup groups on a 128-bit content hash, never on the raw text —
  *    the shuffle carries 16 bytes + doc_id per row, not documents;
  *  - shingle-based near-dup explodes to (shingle, doc) pairs and
  *    equi-joins on the shingle — the join key is again a hash, and hot
  *    shingles (stopword runs) are the skew risk: the exact-jaccard
  *    variant here is the correctness baseline, MinHash/LSH (MinHashLsh)
  *    is the path that bounds pair-generation at scale;
  *  - everything is expressed with codegen'd `functions._` (split /
  *    transform / filter / aggregate higher-order functions), no UDFs.
  */
object TextOps {

  /** Exact deduplication by full-content hash (SURVEY extension; the
    * reference's whole-value table compare `psi_table.c:74-105` is the same
    * semantics: change-detect by content equality). */
  def t1ExactDedup(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(
        min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("copies"))

  /** Token statistics: whitespace tokenization + char/word ratios. */
  def t2TokenStats(s: SparkSession, d: String): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    documents(s, d)
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars_m"),
        size(toks).as("n_tokens"),
        (length(regexp_replace(col("text"), "\\s+", "")).cast("double") /
          size(toks)).as("avg_token_len"))
  }

  /** Quality scoring: stopword ratio, punctuation ratio, mean token
    * length — the length/punct/stopword heuristics of C4-style filters. */
  def t3QualityScore(s: SparkSession, d: String): DataFrame = {
    val stop = Seq("the", "a", "of", "to", "and")
    val toks = split(trim(col("text")), "\\s+")
    val nTok = size(toks).cast("double")
    val stopCnt =
      size(filter(toks, t => t.isin(stop.map(lit): _*))).cast("double")
    val punctCnt =
      length(regexp_replace(col("text"), "[^.,!?;:]", "")).cast("double")
    documents(s, d)
      .select(
        col("doc_id"),
        (stopCnt / nTok).as("stopword_ratio"),
        (punctCnt / length(col("text")).cast("double")).as("punct_ratio"),
        (nTok / length(col("text")).cast("double")).as("token_density"))
  }

  /** Language identification: deterministic marker-word scoring (en/es/fr
    * stopword hits; CJK/Cyrillic by script range), 'und' fallback. A real
    * deployment swaps the marker table for n-gram profiles; the Spark shape
    * (pure column expressions, no shuffle) is the point. */
  def t4LangId(s: SparkSession, d: String): DataFrame = {
    val toks = split(lower(trim(col("text"))), "\\s+")
    def hits(ws: Seq[String]) =
      size(filter(toks, t => t.isin(ws.map(lit): _*)))
    val en = hits(Seq("the", "a", "of", "and", "to", "is"))
    val es = hits(Seq("el", "la", "de", "y", "que", "en"))
    val fr = hits(Seq("le", "la", "de", "et", "que", "est"))
    val hasCjk = length(regexp_replace(col("text"), "[^\\u4e00-\\u9fff]", ""))
    val hasCyr = length(regexp_replace(col("text"), "[^\\u0400-\\u04ff]", ""))
    documents(s, d)
      .select(
        col("doc_id"),
        when(hasCjk > 0, "zh")
          .when(hasCyr > 0, "ru")
          .when(en >= es && en >= fr && en > 0, "en")
          .when(es >= fr && es > 0, "es")
          .when(fr > 0, "fr")
          .otherwise("und").as("pred_lang"))
  }

  /** Word-3-gram shingles per document (shared by fingerprint/jaccard/
    * minhash). 0-based array indexing via SQL `arr[i]`. */
  private def shingled(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(
        col("doc_id"),
        expr(
          """transform(sequence(0, size(split(trim(text), '\\s+')) - 3),
            |  i -> concat_ws(' ',
            |    split(trim(text), '\\s+')[i],
            |    split(trim(text), '\\s+')[i + 1],
            |    split(trim(text), '\\s+')[i + 2]))""".stripMargin)
          .as("shingles"))

  /** Document fingerprint: min-hash-of-shingles (single-permutation MinHash
    * == the rolling-hash fingerprint class of SURVEY's extension list). */
  def t5Fingerprint(s: SparkSession, d: String): DataFrame =
    shingled(s, d)
      .select(
        col("doc_id"),
        array_min(transform(col("shingles"), sh => md5(sh.cast("binary"))))
          .as("fingerprint"))

  /** N-gram Jaccard near-duplicate pairs (exact): explode distinct
    * shingles, self-join on shingle, jaccard = |∩| / (|A|+|B|-|∩|) ≥ 0.5.
    * The exact baseline the MinHash/LSH path approximates. */
  def t6NgramJaccard(s: SparkSession, d: String): DataFrame = {
    val sh = shingled(s, d)
      .select(col("doc_id"), explode(array_distinct(col("shingles")))
        .as("shingle"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes).as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(broadcast(sizes).as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(
        col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("sa.n") + col("sb.n") - col("inter")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  /** MinHash + LSH banded near-dup candidates, then exact-jaccard verify.
    * Deterministic hash family: h_i(x) = first 15 hex digits of
    * md5(i || x) as a long (no Random — reproducible across runs/engines).
    * 16 hashes in 8 bands of 2: candidate pairs share ≥1 band; verified
    * pairs are filtered to true jaccard ≥ 0.5. At scale this bounds the
    * self-join to same-band buckets instead of all shared shingles.
    * (Rows-only oracle: banding is not ANSI-SQL-practical in DuckDB.) */
  def t7MinHashLsh(s: SparkSession, d: String): DataFrame = {
    val numHashes = 16
    val bandSize = 2
    val sh = shingled(s, d)
      .select(col("doc_id"), array_distinct(col("shingles")).as("shingles"))
    // signature[i] = min over shingles of md5-derived 64-bit hash, salted i
    val sigCols = (0 until numHashes).map { i =>
      array_min(transform(col("shingles"),
        x => conv(substring(md5(concat(lit(i.toString), lit("|"), x)), 1, 15),
          16, 10).cast("long"))).as(s"h$i")
    }
    val sigs = sh.select(col("doc_id") +: sigCols: _*)
    // band key = concat of the band's signature slots
    val bands = (0 until numHashes / bandSize).map { b =>
      val cols = (0 until bandSize).map(j => col(s"h${b * bandSize + j}"))
      sigs.select(
        col("doc_id"),
        lit(b).as("band"),
        concat_ws(":", cols: _*).as("band_key"))
    }.reduce(_ unionByName _)
    val cands = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // exact-jaccard verification of the candidate set
    t6NgramJaccard(s, d).as("j")
      .join(cands, Seq("doc_a", "doc_b"), "left_semi")
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** SimHash near-dup: 64-bit simhash over shingle md5 bits, pairs within
    * hamming distance ≤ 12 via banded join on 4×16-bit chunks (rows-only
    * oracle). */
  def t8SimHash(s: SparkSession, d: String): DataFrame = {
    val sh = shingled(s, d)
      .select(col("doc_id"), array_distinct(col("shingles")).as("shingles"))
    // per-shingle 64-bit hash
    val hashed = sh.select(
      col("doc_id"),
      transform(col("shingles"),
        x => conv(substring(md5(x), 1, 15), 16, 10).cast("long")).as("hs"))
    // simhash: for each bit, sign of sum(+1/-1); explode once, aggregate
    // all 60 bit-sums in a single grouped pass (one shuffle)
    val exploded = hashed.select(col("doc_id"), explode(col("hs")).as("h"))
    val bitAggs = (0 until 60).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1L) === 1L, 1L)
        .otherwise(-1L)).as(s"b$b")
    }
    val sums = exploded.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
    val simhash = (0 until 60).map { b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce((a, c) => a.bitwiseOR(c))
    val sigs = sums.select(col("doc_id"), simhash.as("simhash"))
    // banded candidate join: 4 chunks of 15 bits; near-dups share a chunk
    val chunks = (0 until 4).map { c =>
      sigs.select(
        col("doc_id"), col("simhash"),
        lit(c).as("chunk"),
        shiftright(col("simhash"), c * 15).bitwiseAND(0x7fffL).as("ckey"))
    }.reduce(_ unionByName _)
    val pairs = chunks.as("x")
      .join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") &&
          col("x.ckey") === col("y.ckey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.simhash").as("sh_a"), col("y.simhash").as("sh_b"))
      .distinct()
    pairs
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= 12)
      .select("doc_a", "doc_b", "hamming")
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t1_exact_dedup" -> t1ExactDedup _,
    "t2_token_stats" -> t2TokenStats _,
    "t3_quality_score" -> t3QualityScore _,
    "t4_lang_id" -> t4LangId _,
    "t5_fingerprint" -> t5Fingerprint _,
    "t6_ngram_jaccard" -> t6NgramJaccard _,
    "t7_minhash_lsh" -> t7MinHashLsh _,
    "t8_simhash" -> t8SimHash _,
  )
}
