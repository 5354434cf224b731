package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Verify-time parquet materialization of engine-specific artifacts —
  * the TsLake dump-and-recompute pattern generalized to the non-TS
  * queries whose inner layer isn't ANSI-SQL-expressible:
  *
  *  - `simhash_sigs`    (doc_id, sh)          — t8's 48-bit signatures;
  *  - `lsh_buckets`     (vec_id, bucket)      — e2's hyperplane buckets;
  *  - `kmeans_centroids`(centroid_id, cv)     — e6's trained model;
  *  - `a7_est`          (l_returnflag, …)     — a7's HLL estimates.
  *
  * The oracle SQL reads these dumps and re-derives the RELATIONAL
  * remainder independently (banding, hamming distance, same-bucket pair
  * generation, cosine scoring, rsd bound checks), so what gets
  * hash-matched is the operator's semantics, not a copy of its output.
  * All four dumped relations are deterministic (no RNG anywhere), so the
  * dump equals what the corresponding query recomputes at check time.
  */
object OpLake {

  /** Dump location — referenced by the oracle SQL text (SparkEntry reads
    * it per `oracleSql` call, so resetting it regenerates the paths).
    * Verify re-points it under its own outDir so two concurrent Verify
    * runs can never race each other's dumps (the round-7 m12 hazard). */
  @volatile var DumpDir = "/root/repo/target/opdump"

  @volatile private var dumpedFor: (String, String) = null

  /** Materialize the artifact relations once per JVM per (sf dir, dump
    * root) pair (Verify calls this before running the query surface). */
  def ensureDumped(s: SparkSession, sfDir: String): Unit =
    if (dumpedFor != ((sfDir, DumpDir))) synchronized {
      if (dumpedFor != ((sfDir, DumpDir))) {
        writeDumps(s, sfDir); dumpedFor = (sfDir, DumpDir)
      }
    }

  private def save(df: DataFrame, name: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(s"$DumpDir/$name")

  private def writeDumps(s: SparkSession, d: String): Unit = {
    save(operators.TextOps.simhashSigs(s, d), "simhash_sigs")
    save(operators.Multimodal.m6Sigs(s, d), "m6_sigs")
    save(operators.Similarity.e14Candidates(s, d), "e14_cands")
    save(operators.Similarity.e2Buckets(s, d), "lsh_buckets")
    save(operators.Similarity.trainedCentroids(s, d), "kmeans_centroids")
    save(operators.Relational.a7Estimates(s, d), "a7_est")
    save(operators.Relational.a23Estimates(s, d)
      .select("week", "est_users"), "a23_est")
    save(operators.Relational.a11Estimates(s, d), "a11_est")
    save(operators.Relational.a26Estimates(s, d), "a26_est")
    save(operators.Relational.a13Estimates(s, d), "a13_est")
    save(operators.TextOps.t21Model(s, d), "t21_model")
    // t60's per-source surprise: −ln computed once (Spark); the oracle
    // re-derives every count/share/quantized column from raw parquet
    // and re-applies the identical float sequence to these doubles
    save(operators.TextOps.t60Surprise(s, d), "t60_surprise")
    // t61's band relation: the oracle re-aggregates the per-band bucket
    // census (the hashing itself is pinned by t13 recall + t25 parity)
    save(operators.TextOps.t61Bands(s, d), "minhash_bands")
    // m12's chunk relation: the oracle re-derives the dedup accounting
    // and the exact-tiling audit from the dumped split (the split
    // itself — boundary determinism, shift-realignment — is pinned by
    // CdcSpec's property tests)
    save(operators.Multimodal.m12Chunks(s, d), "cdc_chunks")
    // the STREAMING chunk-store decisions (m13's oracle side): one
    // boolean of state per CDC chunk hash across a (doc_id, off)-
    // ordered 4-batch replay
    save(streaming.TwsOps.chunkReplay(s, d), "stream_chunk_ingest")
    // g8's forest: the oracle re-verifies the MSF CERTIFICATE against
    // an independently re-derived backbone (subset/spanning/count/
    // cycle-property via keyed recursive closure) — not a replay
    save(operators.Graph.g8SpanningForest(s, d), "g8_msf")
    // t50's idf model: ln computed once (Spark), both engines read the
    // same bits; the oracle re-derives tf/dl/scoring relationally
    save(operators.TextOps.t50Idf(s, d), "t50_idf")
    // t51's Stupid Backoff models (train-split bigram + unigram
    // branches, ln pre-quantized to DECIMAL(18,9)) and the 1-row OOV
    // floor — the oracle re-derives the held-out pair scoring only
    save(operators.TextOps.t51BigramModel(s, d), "t51_bigram")
    save(operators.TextOps.t51UnigramModel(s, d), "t51_unigram")
    save(operators.TextOps.t51ModelStats(s, d), "t51_stats")
    // the STREAMING near-dup pair set from a deterministic multi-batch
    // replay — the t25 oracle reads this; the Spark side recomputes the
    // batch candidate relation, so the hash gate IS the stream≡batch
    // parity assertion
    save(streaming.TwsOps.nearDupReplay(s, d), "stream_neardup_pairs")
    // the STREAMING CAS ingest decisions (one boolean of state per
    // content hash across a doc_id-ordered 4-batch replay) — the m11
    // oracle reads these; the Spark side recomputes min-doc-per-hash,
    // so the hash gate IS the stream≡batch CAS-accounting parity
    save(streaming.TwsOps.casReplay(s, d), "stream_cas")
    // the built-in streaming exact dedup's emitted winners — the t42
    // oracle reads this; the Spark side recomputes the batch distinct
    // content set, so the hash gate asserts one-emission-per-content
    save(streaming.TwsOps.dedupReplay(s, d), "stream_dedup")
    // the STREAMING packer's emitted rows (per-shard offset state
    // carried across a deterministic 5-batch replay) — the t29 oracle
    // reads this; the Spark side recomputes batch t26Pack, so the hash
    // gate IS the stream≡batch packing parity
    save(streaming.TwsOps.packReplay(s, d), "stream_pack")
    // the STREAMING funnel's completed rows (per-user stage state
    // carried across a ts-ordered 5-batch replay) — the w13 oracle
    // reads this; the Spark side recomputes batch w12Funnel, so the
    // hash gate IS the stream≡batch funnel parity
    save(streaming.TwsOps.funnelReplay(s, d), "stream_funnel")
    // the STREAMING CDC-merge snapshot emissions (per-user last-writer
    // state across a ts-ordered 5-batch replay) — the j12 oracle takes
    // each user's latest seq and drops final-op-D keys; batch
    // j11CdcMerge must hash-match, so the gate IS stream≡batch MERGE
    // parity (including delete semantics)
    save(streaming.TwsOps.cdcReplay(s, d), "stream_cdc")
    // the STREAMING SCD2 closed-interval emissions — the j13 oracle
    // reads these; the Spark side recomputes batch j10's non-current
    // rows, so the hash gate IS stream≡batch dimension-build parity
    save(streaming.TwsOps.scd2Replay(s, d), "stream_scd2")
    // the STREAMING retention emissions (per-user cohort + seen-day
    // state across a ts-ordered 5-batch replay) — the w16 oracle
    // aggregates these; the Spark side recomputes batch w15Retention,
    // so the hash gate IS the stream≡batch retention parity
    save(streaming.TwsOps.retentionReplay(s, d), "stream_retention")
    // the STREAMING gap-fill interpolation emissions (one closed
    // sample + one open-day winner per user across a ts-ordered
    // 5-batch replay + EOF flush) — the w43 oracle reads these; the
    // Spark side recomputes batch w42Interpolate, so the hash gate IS
    // the stream≡batch interpolation parity
    save(streaming.TwsOps.interpReplay(s, d), "stream_interp")
    // the STREAMING last-touch attribution emissions (O(1) latest-
    // touch state per user) — the w23 oracle reads these; the Spark
    // side recomputes the batch window-max detail, so the hash gate
    // IS stream≡batch attribution parity
    save(streaming.TwsOps.attributionReplay(s, d), "stream_attrib")
    // the STREAMING interval-island assignments (16-byte per-user
    // state across a ts-ordered 5-batch replay) — the j17 oracle
    // aggregates these into the coverage census; the Spark side
    // recomputes batch j16IntervalCoverage, so the hash gate IS
    // stream≡batch island-merge parity (spanning batch boundaries)
    save(streaming.TwsOps.intervalReplay(s, d), "stream_intervals")
    // the STREAMING sliding-median emissions (≤5-value list state per
    // user) — the w33 oracle reads these verbatim; the Spark side
    // recomputes batch w25, so the hash gate IS the bounded-frame
    // stream≡batch parity
    save(streaming.TwsOps.medianReplay(s, d), "stream_median")
    // the e21 per-vector assignment audit relation (fixed-point sims
    // computed once in Spark's deterministic kernel) — the e21 oracle
    // aggregates these; Spark recomputes the same aggregation
    save(operators.Similarity.e21AssignRel(s, d), "e21_assign")
    // the STREAMING EWMA emissions (8-byte last-smoothed-value state
    // across a day-ordered 5-batch replay) — the a35 oracle reads
    // these verbatim; the Spark side recomputes batch a34Ewma, so the
    // hash gate IS stream≡batch recurrence parity across seams
    save(streaming.TwsOps.ewmaReplay(s, d), "stream_ewma")
    // the STREAMING Page–Hinkley emissions (32-byte count/sum/stat/min
    // state across a day-ordered 5-batch replay) — the a53 oracle
    // reads these verbatim; the Spark side recomputes the batch δ=0
    // prefix-window series, so the hash gate IS stream≡batch drift-
    // detector parity across seams
    save(streaming.TwsOps.phReplay(s, d), "stream_ph")
    // a27's quantized decay table (pow computed once in Spark)
    save(operators.Relational.a27DecayWeights(s, d), "a27_decay")
  }
}
