package graft

/** The engine's scale constants in ONE auditable place (r11 verdict
  * item 8). Two classes of knob:
  *
  *  - **Free knobs** (referenced from the code): change here, rebuild,
  *    everything downstream follows — these are sf-scale defaults whose
  *    production values are sized to the deployment (shown per entry).
  *  - **Oracle-pinned constants** (documented here, defined at the call
  *    site): the board's DuckDB oracle SQL mirrors them literally, so
  *    changing one is a TWO-FILE edit (the Scala query AND its oracle)
  *    — centralizing the value would hide that coupling, so the entry
  *    records where both halves live instead.
  *
  * Every entry names the SURVEY.md §2 row it governs.
  */
object ScaleKnobs {

  // ------------------------------------------------------------ free knobs

  /** S16/S18/S31 — default hash-bucket count for merge tables
    * (`MergeInto.create`, `layout=bucketed:<key>` without an explicit
    * `:<n>`). Sizing rule at 100 TB: buckets ≈ table_bytes /
    * (1–4 GB), so a bucket rewrite is one executor-sized task and a
    * point lookup reads O(table/N). 256 suits the low-TB range;
    * declare `bucketed:<key>:<n>` per table beyond it. */
  val DefaultMergeBuckets = 256

  /** S41 — cap on deletion-vector positions one V2 scan loads
    * DRIVER-side (DvStore): under it, masks load once and ship with
    * the reader factory; past it, each reader loads its own file's
    * positions executor-side (per-task I/O = one commit dir's dv
    * dirs — unbounded scale, no driver memory at stake either way).
    * 20M positions ≈ low hundreds of MB with path strings — the
    * single-read fast path stays generous, and a table past it is
    * overdue for `CALL system.compact` regardless (compaction
    * materializes masks away). @volatile test hook: the executor path
    * is exercised by forcing the cap to 0. */
  @volatile var DvDriverPositionCap: Long = 20L * 1000 * 1000

  /** S44 — bloom point-index defaults (`bloomCols` table property):
    * false-positive rate (override per table with `bloomFpp`), the
    * per-dir row cap past which a dir's bloom is skipped (a sidecar for
    * 1M items at 1% ≈ 1.2 MB — past that, the dir is no longer "point
    * lookup" shaped and min/max stats plus layout carry the pruning),
    * and the sizing fallback when a dir has no recorded rowcount. */
  val BloomFpp = 0.01
  val BloomMaxItems = 1L * 1000 * 1000
  val BloomDefaultItems = 100L * 1000

  /** S44 — driver-side probe budgets (ManifestTable.pruneByBloom).
    * Bloom pruning runs on the DRIVER during planning, so both axes
    * must be bounded or a big table stalls every query that plans:
    *  - max probe POINTS (static EqualTo/In and runtime DPP IN-sets):
    *    past it, skip bloom pruning entirely — a thousand-key IN-set
    *    is a join, not a point lookup, and O(dirs × points) membership
    *    tests would bill it to planning latency;
    *  - max SIDECARS loaded per scan: sidecars load lazily per
    *    candidate dir (an `fs.open` each — a GET on an object store);
    *    past the budget the remaining dirs pass unpruned (prune less,
    *    never wrong). Loads are parallelized over a small bounded
    *    pool ([[BloomProbeThreads]]) — serial driver GETs are the
    *    first thing that dies against object-store latency at 100 TB. */
  /** @volatile test hooks: the budget paths are exercised by lowering
    * them (GraftBloomSpec), like [[DvDriverPositionCap]]. */
  @volatile var BloomProbeMaxPoints = 1024
  @volatile var BloomProbeMaxSidecars = 256
  val BloomProbeThreads = 8

  /** S53 — log2 of the per-dir HLL NDV sketch's bucket count (the
    * DataSketches lgConfigK Spark's own `hll_sketch_agg` takes).
    * 12 = Spark's default: ~1.6% relative standard error at ~2 KB per
    * (dir, column) of manifest payload — re-ANALYZE reads ZERO old
    * data in exchange. Lower it on tables with very many small dirs;
    * sketches at different lgK still union (DataSketches downsamples). */
  val NdvSketchLgK = 12

  /** Manifest-snapshot cache entries (ManifestTable.snapshotOf): parsed
    * manifests served across OPERATIONS, keyed on the manifest FILE's
    * identity (path, version, mtime, length) — immune to the
    * DROP+CREATE same-path renumbering hazard because a recreated
    * version is a different file. At 100 TB the manifest parse is the
    * fixed metadata cost of every query; 16 entries covers a session's
    * working set of tables while bounding driver heap (entries hold the
    * parsed path/stats maps). */
  val SnapshotCacheEntries = 16

  /** S11/S13/S14/S19/S27/S29 — default clustered-dir fan-out `k` for
    * compaction and clustered-on-arrival ingest. At 100 TB size k so
    * each dir is a few GB (k ≈ table_bytes / 2 GB); the SQL surface
    * takes it per call (`CALL system.compact(..., k => n)`). */
  val DefaultClusterDirs = 4

  /** T42 — doc_ids per prefix-sum bucket in the two-level distributed
    * cumsum (Curation.sequencePack). The bucket-TOTALS frame the
    * driver-side window sees has corpus_rows / this many rows — size
    * it so that frame stays thousands, never millions (at 1e12 docs,
    * bucketW = 1e7 keeps the totals frame at 1e5 rows). */
  val PackBucketWidth = 100L

  /** S18 — max distinct keys a point lookup may collect into its
    * pushed `isin` list before failing loudly (MergeInto.lookup):
    * bounds driver memory and predicate size; larger key sets are
    * joins, not lookups. */
  val LookupMaxKeys = 10000

  // ----------------------------------------- oracle-pinned constants (docs)

  /** T4/T27/X11 — minhash geometry: 8 md5 lanes folded into 4 bands of
    * 2 (TextVector.md5Lanes / minhashBandKeys). Pinned with the DuckDB
    * oracle's literal md5 seed-suffix algebra — change BOTH or the
    * hash gate breaks. Production tunes bands×rows to the target
    * Jaccard threshold curve (b·r = lanes; threshold ≈ (1/b)^(1/r)). */
  val MinhashGeometryDoc = "8 lanes = 4 bands x 2 rows (TextVector.scala)"

  /** T25/T26 — k-means / SemDeDup cluster count (8) — pinned with
    * their oracle replays (the DuckDB SQL filters `vec_id < 8`
    * literally). The scale rule is the point: k grows WITH the corpus
    * so per-cluster pair counts stay bounded (SemDeDup's all-pairs
    * bound); production sizes k ≈ corpus_rows / target_cluster_size. */
  val KMeansClustersDoc = "8 (t25_kmeans_curate / t26_semantic_dedup + oracles)"

  /** T6b — IVF centroid count (8, seeded from the first 8 corpus
    * vectors) — pinned with t6b's oracle replay. Production: centroids
    * ≈ sqrt(corpus_rows), trained, with nprobe > 1. */
  val IvfCentroidsDoc = "8 (t6_topk_nn_ivf + its oracle SQL)"

  /** T31 — PQ geometry: 4 subspaces x 16 dims x 8 codewords, ADC
    * shortlist 100 — pinned with t31's oracle replay. Production:
    * m = dim/8 subspaces, 256 codewords (one byte), shortlist sized to
    * the recall target measured in TextVectorSpec's harness. */
  val PqGeometryDoc = "4 subspaces x 16 dims, 8 codewords, shortlist 100 " +
    "(t31_pq_ann + its oracle SQL)"
}
