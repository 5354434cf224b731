package graft

/** Base directory for engine-persisted index/lake artifacts (IVF
  * inverted lists, the incremental-IVF delta index, BM25 postings,
  * the DSIR feature lake). Env override wins; Verify re-points it
  * under its own outDir so two concurrent Verify runs can never
  * overwrite an index the other is mid-read on (the round-8
  * concurrent-run e10 FILE_NOT_EXIST failure — same hazard class as
  * the OpLake/TsLake dump roots and the warehouse dir, closed the
  * same way). */
object IndexDir {
  @volatile var base: String =
    sys.env.getOrElse("GRAFT_INDEX_DIR", "target/ivfindex")
}
