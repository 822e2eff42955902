package graft.media

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL-checkable faces of the media pipeline (SURVEY §2.6 M1/M3):
  * metadata extraction over binary columns and 1→N frame sampling, with
  * md5-derived fake decode values so DuckDB can reproduce them exactly.
  */
object MediaQueries {

  /** M1: binary blob + typed metadata (byte length, container-derived
    * format, md5-derived fake dimensions).
    */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("blob", col("text").cast("binary"))
      .select(
        col("doc_id").as("media_id"),
        octet_length(col("blob")).as("byte_len"),
        element_at(array(lit("jpeg"), lit("png"), lit("webp")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        (lit(16) + conv(substring(md5(col("text")), 1, 4), 16, 10)
          .cast("long") % 1280).as("width"),
        (lit(16) + conv(substring(md5(col("text")), 5, 4), 16, 10)
          .cast("long") % 720).as("height"))
      .orderBy(col("media_id"))

  val mediaMetaSql: String = """
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS byte_len,
           ['jpeg', 'png', 'webp'][(doc_id % 3 + 1)::INT] AS format,
           16 + ('0x' || substring(md5(text), 1, 4))::BIGINT % 1280 AS width,
           16 + ('0x' || substring(md5(text), 5, 4))::BIGINT % 720 AS height
    FROM documents ORDER BY media_id"""

  /** M3: frame sampling — each media row explodes to its sampled
    * frames (1 + len%4), with a per-frame content hash; the 1→N shape
    * every video/page pipeline needs.
    */
  def mediaFrames(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("byte_len", octet_length(col("text").cast("binary")))
      .withColumn("n_frames", (col("byte_len") % 4 + 1).cast("int"))
      .select(col("doc_id").as("media_id"), col("n_frames"),
        explode(expr("sequence(1, n_frames)")).as("frame_idx"),
        col("text"))
      .withColumn("frame_hash", substring(
        md5(concat(col("text"), lit("-"), col("frame_idx"))), 1, 8))
      .select(col("media_id"), col("n_frames"), col("frame_idx"),
        col("frame_hash"))
      .orderBy(col("media_id"), col("frame_idx"))

  val mediaFramesSql: String = """
    WITH m AS (
      SELECT doc_id AS media_id, text,
             (octet_length(encode(text)) % 4 + 1)::INT AS n_frames
      FROM documents)
    SELECT media_id, n_frames, frame_idx,
           substring(md5(text || '-' || frame_idx::VARCHAR), 1, 8) AS frame_hash
    FROM (SELECT media_id, text, n_frames,
                 unnest(range(1, n_frames + 1)) AS frame_idx FROM m)
    ORDER BY media_id, frame_idx"""

  /** M4: audio-style chunking — each blob splits into fixed-size byte
    * windows with offsets and a per-chunk content hash: the 1→N shape
    * for streaming transcription/feature extraction, where each chunk
    * is an independent work unit (partition-parallel, no chunk ever
    * crosses a row boundary). Mapping bytes→seconds is codec metadata
    * (the stub codec's territory); the chunk ledger here is what the
    * real pipeline hands to workers.
    */
  def mediaChunks(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("byte_len", octet_length(col("text").cast("binary")))
      .withColumn("n_chunks", expr("cast((byte_len + 99) div 100 as int)"))
      .select(col("doc_id").as("media_id"), col("byte_len"),
        col("n_chunks"),
        explode(expr("sequence(1, n_chunks)")).as("chunk_idx"),
        col("text"))
      .withColumn("byte_off", ((col("chunk_idx") - 1) * 100).cast("long"))
      .withColumn("chunk_bytes",
        least(lit(100L), col("byte_len") - col("byte_off")))
      .withColumn("chunk_hash", substring(
        md5(concat(col("text"), lit("@"), col("chunk_idx"))), 1, 8))
      .select(col("media_id"), col("n_chunks"), col("chunk_idx"),
        col("byte_off"), col("chunk_bytes"), col("chunk_hash"))
      .orderBy(col("media_id"), col("chunk_idx"))

  val mediaChunksSql: String = """
    WITH m AS (
      SELECT doc_id AS media_id, text,
             octet_length(encode(text)) AS byte_len,
             ((octet_length(encode(text)) + 99) // 100)::INT AS n_chunks
      FROM documents)
    SELECT media_id, n_chunks, chunk_idx,
           ((chunk_idx - 1) * 100)::BIGINT AS byte_off,
           least(100, byte_len - (chunk_idx - 1) * 100)::BIGINT
             AS chunk_bytes,
           substring(md5(text || '@' || chunk_idx), 1, 8) AS chunk_hash
    FROM (SELECT media_id, text, byte_len, n_chunks,
                 unnest(range(1, n_chunks + 1))::INT AS chunk_idx
          FROM m)
    ORDER BY media_id, chunk_idx"""

  /** M5: content-addressed chunk dedup — the storage face of a blob
    * lake: chunk every blob into fixed byte windows, hash the CONTENT
    * (not a per-row salt), and group identical chunks across media.
    * Duplicate chunks are stored once and referenced (the CAS shape);
    * the shuffle carries 16-byte content hashes, never chunk bytes.
    * Near-duplicate blobs surface as shared chunk runs — the byte-level
    * sibling of D7's word-window spans.
    */
  def mediaChunkDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      // chunk windows slice CHARACTERS (substring), so the chunk count
      // must come from char_length too: deriving it from the UTF-8
      // octet count misaligns windows on multibyte text and emits
      // trailing empty chunks whose md5('') collides across all media
      .withColumn("char_len", length(col("text")))
      .withColumn("n_chunks", expr("cast((char_len + 99) div 100 as int)"))
      .select(col("doc_id").as("media_id"),
        explode(expr("sequence(1, n_chunks)")).as("chunk_idx"), col("text"))
      .withColumn("chunk_hash",
        md5(substring(col("text"), (col("chunk_idx") - 1) * 100 + 1, lit(100))
          .cast("binary")))
      .groupBy(col("chunk_hash"))
      .agg(countDistinct(col("media_id")).as("n_media"),
        count(lit(1)).as("n_occurrences"),
        min(col("media_id")).as("keeper_media"))
      .filter(col("n_media") >= 2)
      .orderBy(col("chunk_hash"))

  val mediaChunkDedupSql: String = """
    WITH m AS (
      SELECT doc_id AS media_id, text,
             length(text) AS char_len
      FROM documents),
    chunks AS (
      SELECT media_id,
             md5(substring(text, (k-1)*100+1, 100)) AS chunk_hash
      FROM (SELECT media_id, text,
                   unnest(range(1, 1 + (char_len + 99) // 100)) AS k
            FROM m))
    SELECT chunk_hash, count(DISTINCT media_id) AS n_media,
           count(*) AS n_occurrences, min(media_id) AS keeper_media
    FROM chunks GROUP BY chunk_hash
    HAVING count(DISTINCT media_id) >= 2
    ORDER BY chunk_hash"""

  /** M6: content-defined chunking + CAS dedup — the rsync/CDC answer
    * to M5's weakness: fixed windows shift under a single insertion,
    * so two media differing by one leading word share NO fixed chunks.
    * CDC cuts where a rolling fingerprint of the last 3 words hits
    * `h % 16 == 0`, so boundaries are CONTENT-anchored: after an
    * insertion, chunks re-align at the first surviving boundary and
    * everything downstream dedups again (spec plants exactly that).
    * Segmentation is one narrow projection (higher-order filter over
    * word positions → cut list → slice per chunk); the CAS rollup then
    * groups 16-byte chunk hashes across media — the same
    * store-once-reference-many shape as M5, now insertion-robust.
    * The md5-derived fingerprint keeps the oracle exact: DuckDB
    * reproduces boundaries, chunks, and the dedup ledger end to end.
    */
  def mediaCdcDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"), split(col("text"), " ").as("w"))
      .withColumn("base", expr(
        """concat(
          |  array(0),
          |  filter(transform(sequence(1, size(w)),
          |    i -> if(i >= 3 and
          |      cast(conv(substring(md5(concat_ws(' ', slice(w, i-2, 3))),
          |        1, 7), 16, 10) as bigint) % 16 = 0, i, -1)),
          |    x -> x > 0))""".stripMargin))
      // append the terminal cut only when the last rolling boundary
      // didn't already land there (array_distinct would do it, but
      // order preservation there is a Spark detail the oracle's engine
      // does not promise — make the construction order-explicit)
      .withColumn("cuts", expr(
        "if(element_at(base, size(base)) = size(w), base, " +
          "concat(base, array(size(w))))"))
      .select(col("media_id"),
        posexplode(expr(
          """transform(sequence(1, size(cuts)-1),
            |  j -> concat_ws(' ', slice(w, element_at(cuts, j) + 1,
            |    element_at(cuts, j+1) - element_at(cuts, j))))""".stripMargin)))
      .select(col("media_id"), (col("pos") + 1).as("chunk_idx"),
        md5(col("col")).as("chunk_hash"),
        size(split(col("col"), " ")).cast("long").as("n_words"))
      .groupBy(col("chunk_hash"))
      .agg(countDistinct(col("media_id")).as("n_media"),
        count(lit(1)).as("n_occurrences"),
        min(col("media_id")).as("keeper_media"),
        max(col("n_words")).as("n_words"))
      .filter(col("n_media") >= 2)
      .orderBy(col("chunk_hash"))

  val mediaCdcDedupSql: String = """
    WITH m AS (SELECT doc_id AS media_id, string_split(text, ' ') AS w
               FROM documents),
    cb AS (
      SELECT media_id, w,
             list_concat(
               [0],
               list_filter(list_transform(range(1, 1 + len(w)),
                 i -> CASE WHEN i >= 3 AND
                   ('0x' || substring(md5(array_to_string(
                     list_slice(w, i-2, i), ' ')), 1, 7))::BIGINT % 16 = 0
                   THEN i ELSE -1 END),
                 x -> x > 0)) AS base
      FROM m),
    cut AS (
      SELECT media_id, w,
             CASE WHEN base[len(base)] = len(w) THEN base
                  ELSE list_concat(base, [len(w)]) END AS cuts
      FROM cb),
    chunks AS (
      SELECT media_id,
             array_to_string(list_slice(w, cuts[j] + 1, cuts[j+1]), ' ')
               AS chunk
      FROM (SELECT media_id, w, cuts,
                   unnest(range(1, len(cuts))) AS j
            FROM cut))
    SELECT md5(chunk) AS chunk_hash,
           count(DISTINCT media_id) AS n_media,
           count(*) AS n_occurrences,
           min(media_id) AS keeper_media,
           max(len(string_split(chunk, ' ')))::BIGINT AS n_words
    FROM chunks GROUP BY chunk_hash
    HAVING count(DISTINCT media_id) >= 2
    ORDER BY chunk_hash"""

  /** M7: BYTE-level CDC + CAS dedup — M6 cuts on word boundaries,
    * which only exist for text; real media dedup (the storage layer
    * under the tape's binary payloads) must cut on BYTES. Same CDC
    * idea one level down: a rolling fingerprint of the last 4 bytes
    * cuts where `h % 32 == 0`, so boundaries are content-anchored in
    * the byte stream and survive insertions that shift every
    * fixed-offset window. The payload travels as its hex encoding
    * (2 chars/byte) because substring-on-hex is exact and identical in
    * both engines for ANY byte value — including multibyte UTF-8 and
    * binary blobs where character windows misalign (the M5 lesson).
    * Per-row segmentation is one narrow projection (no shuffle); the
    * CAS rollup shuffles 16-byte chunk hashes only, never payloads —
    * at 100 TB the exchange carries ~n/20 hashes, not bytes.
    */
  def mediaCdcBytes(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"),
        hex(col("text").cast("binary")).as("h"))
      .withColumn("n", expr("cast(length(h) div 2 as int)"))
      .withColumn("base", expr(
        """concat(
          |  array(0),
          |  filter(transform(sequence(1, n),
          |    i -> if(i >= 4 and
          |      cast(conv(substring(md5(substring(h, 2*i-7, 8)),
          |        1, 7), 16, 10) as bigint) % 32 = 0, i, -1)),
          |    x -> x > 0))""".stripMargin))
      // terminal cut appended order-explicitly (same reasoning as M6:
      // the oracle's engine does not promise list_distinct order)
      .withColumn("cuts", expr(
        "if(element_at(base, size(base)) = n, base, " +
          "concat(base, array(n)))"))
      .select(col("media_id"),
        posexplode(expr(
          """transform(sequence(1, size(cuts)-1),
            |  j -> substring(h, 2*element_at(cuts, j) + 1,
            |    2*(element_at(cuts, j+1) - element_at(cuts, j))))""".stripMargin)))
      .select(col("media_id"), (col("pos") + 1).as("chunk_idx"),
        md5(col("col")).as("chunk_hash"),
        expr("cast(length(col) div 2 as bigint)").as("n_bytes"))
      .groupBy(col("chunk_hash"))
      .agg(countDistinct(col("media_id")).as("n_media"),
        count(lit(1)).as("n_occurrences"),
        min(col("media_id")).as("keeper_media"),
        max(col("n_bytes")).as("n_bytes"))
      .filter(col("n_media") >= 2)
      .orderBy(col("chunk_hash"))

  val mediaCdcBytesSql: String = """
    WITH m AS (
      SELECT doc_id AS media_id, hex(encode(text)) AS h,
             octet_length(encode(text)) AS n
      FROM documents),
    cb AS (
      SELECT media_id, h, n,
             list_concat([0],
               list_filter(list_transform(range(1, 1 + n),
                 i -> CASE WHEN i >= 4 AND
                   ('0x' || substring(md5(substring(h, 2*i-7, 8)),
                     1, 7))::BIGINT % 32 = 0
                   THEN i ELSE -1 END),
                 x -> x > 0)) AS base
      FROM m),
    cut AS (
      SELECT media_id, h,
             CASE WHEN base[len(base)] = n THEN base
                  ELSE list_concat(base, [n]) END AS cuts
      FROM cb),
    chunks AS (
      SELECT media_id,
             substring(h, 2*cuts[j] + 1, 2*(cuts[j+1] - cuts[j])) AS chunk
      FROM (SELECT media_id, h, cuts, unnest(range(1, len(cuts))) AS j
            FROM cut))
    SELECT md5(chunk) AS chunk_hash,
           count(DISTINCT media_id) AS n_media,
           count(*) AS n_occurrences,
           min(media_id) AS keeper_media,
           (max(length(chunk) // 2))::BIGINT AS n_bytes
    FROM chunks GROUP BY chunk_hash
    HAVING count(DISTINCT media_id) >= 2
    ORDER BY chunk_hash"""

  /** M8 near-dup radius: candidate pairs from band collisions keep
    * only hamming ≤ this many of the 64 hash bits.
    */
  val AhashRadius = 12

  /** M8: perceptual-hash near-dup over decoded media — the aHash
    * pipeline every image-dedup stack runs (pHash/aHash family):
    * decode to a fixed 8×8 luminance grid, hash = one bit per cell
    * (pixel > mean), near-duplicates = small hamming distance. The
    * stub decode derives each "pixel" from ITS OWN slice of the
    * payload (char-sliced per the M5 lesson, md5 per slice), so
    * locality is REAL: media sharing most content share most pixels,
    * and the mean test makes the hash brightness-invariant the way
    * aHash is. Serving is the D4 SimHash shape: 4×16-bit band index
    * equi-join proposes candidates, exact hamming (one narrow
    * zip-compare, no payload shuffle) verifies ≤ [[AhashRadius]].
    * The mean threshold compares pixel·64 > Σpixels in exact
    * integers — no division, no float, both engines bit-equal.
    */
  /** The 64-slice stub "luminance" frame both perceptual hashes read:
    * (media_id, px[64], psum). Char-sliced per the M5 lesson, one md5
    * per slice — computed ONCE however many hash families consume it.
    */
  private def pxFrame(docs: DataFrame): DataFrame = docs
    .withColumn("seg", greatest(lit(1L),
      expr("(length(text) + 63) div 64")))
    .withColumn("px", expr(
      "transform(sequence(1, 64), i -> cast(conv(substring(md5(" +
        "substring(text, cast((i-1)*seg+1 as int), cast(seg as int))), " +
        "1, 2), 16, 10) as long))"))
    .withColumn("psum", expr("aggregate(px, 0L, (acc, x) -> acc + x)"))
    .select(col("media_id"), col("px"), col("psum"))

  /** D4-shaped serving over any 64-bit hash string column `h`: 4×16
    * band equi-join proposes, exact hamming ≤ radius verifies. Output
    * (media_a, media_b, hamming), unordered.
    */
  /** The 4×16 band-key frame over any 64-bit hash string column `h`:
    * (media_id, h, band, bk) — shared by the uncapped (M8) and
    * occupancy-capped (M13) candidate builders.
    */
  private[media] def bandsOf(hashed: DataFrame): DataFrame =
    hashed.select(col("media_id"), col("h"),
      explode(expr("transform(sequence(1, 4), b -> " +
        "struct(b as band, substring(h, (b-1)*16+1, 16) as bk))"))
        .as("x"))
      .select(col("media_id"), col("h"),
        col("x.band").as("band"), col("x.bk").as("bk"))

  private def bandVerify(hashed: DataFrame, radius: Long): DataFrame = {
    val bands = bandsOf(hashed)
    val cand = bands.select(col("media_id").as("media_a"),
        col("h").as("h_a"), col("band"), col("bk"))
      .hint("shuffle_hash")
      .join(bands.select(col("media_id").as("media_b"),
        col("h").as("h_b"), col("band"), col("bk")),
        Seq("band", "bk"))
      .filter(col("media_a") < col("media_b"))
      .select(col("media_a"), col("media_b"), col("h_a"), col("h_b"))
      .distinct()
    // E27: the verify kernel is the codegen'd byte-walk, not the
    // sequence+filter composition (3·n allocations per candidate pair)
    cand.withColumn("hamming",
        graft.functions.HammingDistance(col("h_a"), col("h_b")))
      .filter(col("hamming") <= radius)
      .select(col("media_a"), col("media_b"), col("hamming"))
  }

  /** The persisted (media_id, h) aHash frame over a (media_id, text)
    * corpus — shared by M8's pair ledger and M13's capped clusters. */
  private[media] def ahashFrame(docs: DataFrame): DataFrame =
    graft.CachedFrames.persist(pxFrame(docs)
      .withColumn("h", expr(
        "concat_ws('', transform(px, x -> " +
          "case when x * 64 > psum then '1' else '0' end))"))
      .select(col("media_id"), col("h")))

  private[media] def ahashOn(docs: DataFrame): DataFrame =
    bandVerify(ahashFrame(docs), AhashRadius)
      .orderBy(col("media_a"), col("media_b"))

  def mediaAhashDedup(s: SparkSession, dir: String): DataFrame =
    ahashOn(Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"), col("text")))

  val mediaAhashDedupSql: String = s"""
    WITH g AS (
      SELECT doc_id AS media_id, text,
             greatest(1, (length(text) + 63) // 64) AS seg
      FROM documents),
    px AS (
      SELECT media_id,
             list_transform(range(1, 65), i ->
               ('0x' || substring(md5(substring(text,
                 ((i-1)*seg+1)::INT, seg::INT)), 1, 2))::BIGINT) AS px
      FROM g),
    ps AS (SELECT media_id, px, list_sum(px)::BIGINT AS psum FROM px),
    h AS (
      SELECT media_id,
             array_to_string(list_transform(px, x ->
               CASE WHEN x * 64 > psum THEN '1' ELSE '0' END), '') AS ahash
      FROM ps),
    bands AS (
      SELECT media_id, ahash, b AS band,
             substring(ahash, (b-1)*16+1, 16) AS bk
      FROM h, unnest(range(1, 5)) AS t(b)),
    cand AS (
      SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
             a.ahash AS ah_a, b.ahash AS ah_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bk = b.bk
      WHERE a.media_id < b.media_id)
    SELECT media_a, media_b,
           len(list_filter(range(1, 65), i ->
             ah_a[i] != ah_b[i]))::BIGINT AS hamming
    FROM cand
    WHERE len(list_filter(range(1, 65), i -> ah_a[i] != ah_b[i]))
      <= $AhashRadius
    ORDER BY media_a, media_b"""

  /** M13: occupancy-capped perceptual-hash dedup CLUSTERS — M8's
    * 100 TB face. M8's band join proposes O(occ²) pairs per bucket,
    * and under whole-corpus duplication (exactly when a media dedup
    * pass matters most) hot buckets grow quadratically — the sf1
    * probe measured M8 at 11.1× for 10× data, and that growth IS the
    * pair mass. The D15 discipline bounds it: per band bucket,
    * propose the STAR to the bucket min (O(occ) edges, connectivity
    * preserved at the candidate level) plus all pairs among the
    * bottom-[[MediaCapK]] ids (≤ C(CapK,2), borderline-pair
    * robustness), haul hashes only for survivors of the distinct,
    * hamming-verify, and name each near-dup cluster through D6's
    * components. Candidate mass is O(occ + CapK²) per bucket — linear
    * in the corpus under ANY skew — and the output moves from M8's
    * pair ledger to the decision grain a curation pass consumes:
    * (media_id, canonical, cluster_size).
    */
  val MediaCapK = 8

  /** Capped candidate pairs over a (media_id, h) hash frame — exposed
    * for MediaSpec's pair-mass comparison against the uncapped join.
    */
  private[media] def cappedMediaCandidates(hashed: DataFrame): DataFrame = {
    val bands = bandsOf(hashed).select(col("media_id"), col("band"),
      col("bk"))
    val bmin = bands.groupBy(col("band"), col("bk"))
      .agg(min(col("media_id")).as("m"))
    // bmin is O(buckets) ~ O(corpus): SHUFFLE_HASH, never broadcast
    val star = bands.hint("shuffle_hash").join(bmin, Seq("band", "bk"))
      .filter(col("media_id") =!= col("m"))
      .select(col("m").as("media_a"), col("media_id").as("media_b"))
    val kpairs = bands.groupBy(col("band"), col("bk"))
      .agg(graft.functions.TopKAgg(lit(0.0), col("media_id"), MediaCapK)
        .as("kept"))
      .select(expr("array_sort(transform(kept, x -> x.id))").as("ids"))
      .select(explode(expr(
        "flatten(transform(sequence(0, size(ids) - 1), i -> " +
          "transform(slice(ids, i + 2, size(ids)), y -> " +
          "struct(ids[i] AS media_a, y AS media_b))))")).as("p"))
      .select(col("p.media_a"), col("p.media_b"))
    star.union(kpairs).distinct()
  }

  def mediaAhashClusters(s: SparkSession, dir: String): DataFrame = {
    val h = ahashFrame(Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"), col("text")))
    val cand = cappedMediaCandidates(h)
    val edges = cand
      .join(h.select(col("media_id").as("media_a"), col("h").as("h_a"))
        .hint("shuffle_hash"), Seq("media_a"))
      .join(h.select(col("media_id").as("media_b"), col("h").as("h_b"))
        .hint("shuffle_hash"), Seq("media_b"))
      .withColumn("hamming",
        graft.functions.HammingDistance(col("h_a"), col("h_b")))
      .filter(col("hamming") <= AhashRadius)
      .select(col("media_a"), col("media_b"))
    val labels = graft.operators.ConnectedComponents.run(edges)
    val sizes = labels.groupBy(col("root"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("root"))
      .select(col("node").as("media_id"), col("root").as("canonical"),
        col("cluster_size"))
      .orderBy(col("media_id"))
  }

  val mediaAhashClustersSql: String = s"""
    WITH RECURSIVE g AS (
      SELECT doc_id AS media_id, text,
             greatest(1, (length(text) + 63) // 64) AS seg
      FROM documents),
    px AS (
      SELECT media_id,
             list_transform(range(1, 65), i ->
               ('0x' || substring(md5(substring(text,
                 ((i-1)*seg+1)::INT, seg::INT)), 1, 2))::BIGINT) AS px
      FROM g),
    ps AS (SELECT media_id, px, list_sum(px)::BIGINT AS psum FROM px),
    h AS (
      SELECT media_id,
             array_to_string(list_transform(px, x ->
               CASE WHEN x * 64 > psum THEN '1' ELSE '0' END), '') AS ahash
      FROM ps),
    bands AS (
      SELECT media_id, ahash, b AS band,
             substring(ahash, (b-1)*16+1, 16) AS bk
      FROM h, unnest(range(1, 5)) AS t(b)),
    bmin AS (SELECT band, bk, min(media_id) AS m
             FROM bands GROUP BY band, bk),
    star AS (SELECT bm.m AS media_a, b.media_id AS media_b
             FROM bands b JOIN bmin bm USING (band, bk)
             WHERE b.media_id != bm.m),
    topk AS (SELECT band, bk, media_id
             FROM (SELECT *, row_number() OVER (
                     PARTITION BY band, bk ORDER BY media_id) AS rn
                   FROM bands)
             WHERE rn <= $MediaCapK),
    kp AS (SELECT a.media_id AS media_a, b.media_id AS media_b
           FROM topk a JOIN topk b
             ON a.band = b.band AND a.bk = b.bk
            AND a.media_id < b.media_id),
    cand AS (SELECT DISTINCT media_a, media_b FROM
             (SELECT media_a, media_b FROM star
              UNION ALL SELECT media_a, media_b FROM kp)),
    edges AS (
      SELECT media_a, media_b
      FROM (SELECT c.media_a, c.media_b, ha.ahash AS ah_a,
                   hb.ahash AS ah_b
            FROM cand c
            JOIN h ha ON ha.media_id = c.media_a
            JOIN h hb ON hb.media_id = c.media_b)
      WHERE len(list_filter(range(1, 65), i -> ah_a[i] != ah_b[i]))
        <= $AhashRadius),
    und AS (SELECT media_a AS a, media_b AS b FROM edges
            UNION SELECT media_b, media_a FROM edges),
    n AS (SELECT DISTINCT a AS m FROM und),
    reach(m, r) AS (
      SELECT m, m FROM n
      UNION
      SELECT u.b, reach.r FROM reach JOIN und u ON u.a = reach.m),
    comp AS (SELECT m, min(r) AS canonical FROM reach GROUP BY m),
    sizes AS (SELECT canonical, count(*) AS cluster_size
              FROM comp GROUP BY canonical)
    SELECT comp.m AS media_id, comp.canonical, sizes.cluster_size
    FROM comp JOIN sizes USING (canonical) ORDER BY media_id"""

  /** M10: perceptual-hash FAMILY AGREEMENT — aHash (mean threshold)
    * vs dHash (adjacent gradient, the imagehash library's other
    * default) over the SAME decoded pixel frame, full-outer-joined
    * pair for pair. The operational question this audits: a mean-
    * threshold hash is brightness-invariant but blind to uniform
    * gradients; a difference hash keys on local structure — pairs
    * flagged by one family only are exactly where a dedup pipeline's
    * precision depends on the detector choice, and 'both' pairs are
    * the high-confidence kill list. The pixel frame computes ONCE
    * (shared persisted px — the 64-md5 stub cost is not paid twice);
    * each family serves through the same 4×16 band index + exact
    * hamming ≤ 12 (bandVerify), and the final reconciliation is the
    * A30 FULL OUTER shape on the pair key. dHash here is circular
    * (bit i: px[i] < px[i%64+1]) to keep 64 bits from 64 slices;
    * strict < makes equal-pixel runs stable zeros in both engines.
    */
  def mediaHashAgreement(s: SparkSession, dir: String): DataFrame = {
    val px = graft.CachedFrames.persist(pxFrame(
      Tables.documents(s, dir)
        .select(col("doc_id").as("media_id"), col("text"))))
    val ah = px.withColumn("h", expr(
        "concat_ws('', transform(px, x -> " +
          "case when x * 64 > psum then '1' else '0' end))"))
      .select(col("media_id"), col("h"))
    val dh = px.withColumn("h", expr(
        "concat_ws('', transform(sequence(1, 64), i -> " +
          "case when element_at(px, cast(i as int)) < " +
          "element_at(px, cast(i % 64 + 1 as int)) " +
          "then '1' else '0' end))"))
      .select(col("media_id"), col("h"))
    val ap = bandVerify(ah, AhashRadius)
      .withColumnRenamed("hamming", "ah_hamming")
    val dp = bandVerify(dh, AhashRadius)
      .withColumnRenamed("hamming", "dh_hamming")
    ap.join(dp, Seq("media_a", "media_b"), "full_outer")
      .withColumn("verdict",
        when(col("ah_hamming").isNotNull && col("dh_hamming").isNotNull,
          "both")
          .when(col("ah_hamming").isNotNull, "ahash_only")
          .otherwise("dhash_only"))
      .select(col("media_a"), col("media_b"),
        col("ah_hamming"), col("dh_hamming"), col("verdict"))
      .orderBy(col("media_a"), col("media_b"))
  }

  val mediaHashAgreementSql: String = {
    def serve(hcte: String, out: String): String = s"""
    ${out}_bands AS (
      SELECT media_id, h, b AS band,
             substring(h, (b-1)*16+1, 16) AS bk
      FROM $hcte, unnest(range(1, 5)) AS t(b)),
    ${out}_pairs AS (
      SELECT media_a, media_b,
             len(list_filter(range(1, 65), i -> h_a[i] != h_b[i]))::BIGINT
               AS hamming
      FROM (SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
                   a.h AS h_a, b.h AS h_b
            FROM ${out}_bands a JOIN ${out}_bands b
              ON a.band = b.band AND a.bk = b.bk
            WHERE a.media_id < b.media_id)
      WHERE len(list_filter(range(1, 65), i -> h_a[i] != h_b[i]))
        <= $AhashRadius)"""
    s"""
    WITH g AS (
      SELECT doc_id AS media_id, text,
             greatest(1, (length(text) + 63) // 64) AS seg
      FROM documents),
    px AS (
      SELECT media_id,
             list_transform(range(1, 65), i ->
               ('0x' || substring(md5(substring(text,
                 ((i-1)*seg+1)::INT, seg::INT)), 1, 2))::BIGINT) AS px
      FROM g),
    ps AS (SELECT media_id, px, list_sum(px)::BIGINT AS psum FROM px),
    ah AS (
      SELECT media_id,
             array_to_string(list_transform(px, x ->
               CASE WHEN x * 64 > psum THEN '1' ELSE '0' END), '') AS h
      FROM ps),
    dh AS (
      SELECT media_id,
             array_to_string(list_transform(range(1, 65), i ->
               CASE WHEN px[i] < px[i % 64 + 1] THEN '1' ELSE '0' END),
               '') AS h
      FROM ps),
    ${serve("ah", "ah")},
    ${serve("dh", "dh")}
    SELECT coalesce(a.media_a, d.media_a) AS media_a,
           coalesce(a.media_b, d.media_b) AS media_b,
           a.hamming AS ah_hamming, d.hamming AS dh_hamming,
           CASE WHEN a.hamming IS NOT NULL AND d.hamming IS NOT NULL
                  THEN 'both'
                WHEN a.hamming IS NOT NULL THEN 'ahash_only'
                ELSE 'dhash_only' END AS verdict
    FROM ah_pairs a FULL OUTER JOIN dh_pairs d
      ON a.media_a = d.media_a AND a.media_b = d.media_b
    ORDER BY media_a, media_b"""
  }

  /** M9 scene cut: a frame starts a new scene when its 16-bit
    * signature sits more than this many bits from the previous frame's.
    */
  val SceneCutBits = 6

  /** M9: shot/scene-boundary detection — the video-curation step after
    * M3's frame sampling: segment each media's frame sequence into
    * scenes wherever consecutive frames stop resembling each other
    * (PySceneDetect's content-detector shape). Frames here are SLIDING
    * windows over the payload (step `seg`, width 4·seg — 75% overlap),
    * so consecutive frames genuinely share content; each frame hashes
    * to 16 bits the M8 way (one md5 per cell over the frame's OWN
    * char-slice, bit = cell·16 > Σcells), making inter-frame hamming a
    * real similarity signal rather than an avalanche. A cut fires where
    * hamming > [[SceneCutBits]]; scene ids are the running cut count
    * (one per-media window — frames per media are bounded, so the
    * partition-local sort is O(frames) however large the corpus, and
    * media are embarrassingly parallel). Output is the scene ledger a
    * clip-extraction pipeline consumes: per scene, its frame range and
    * the hamming that opened it. DuckDB reproduces hash, lag, and
    * running sum exactly — the gate checks the whole segmentation.
    */
  /** M9 stage 1: the per-frame 16-bit locality-real hash stream —
    * also the input contract of the R20 streaming face.
    */
  private[graft] def frameHashes(docs: DataFrame): DataFrame =
    docs
      .select(col("media_id"), col("text"),
        length(col("text")).as("len"))
      .withColumn("n_frames", (col("len") % 9 + 4).cast("int"))
      .withColumn("seg", greatest(lit(1L), expr("len div (n_frames + 3)")))
      .select(col("media_id"), col("text"), col("seg"),
        explode(expr("sequence(1, n_frames)")).as("frame_idx"))
      .withColumn("fwin", expr(
        "substring(text, cast((frame_idx-1)*seg+1 as int), " +
          "cast(4*seg as int))"))
      .withColumn("cs", greatest(lit(1L),
        expr("cast((length(fwin) + 15) div 16 as bigint)")))
      .withColumn("px", expr(
        "transform(sequence(1, 16), i -> cast(conv(substring(md5(" +
          "substring(fwin, cast((i-1)*cs+1 as int), cast(cs as int))), " +
          "1, 2), 16, 10) as long))"))
      .withColumn("psum", expr("aggregate(px, 0L, (acc, x) -> acc + x)"))
      .withColumn("fhash", expr(
        "concat_ws('', transform(px, x -> " +
          "case when x * 16 > psum then '1' else '0' end))"))
      .select(col("media_id"), col("frame_idx"), col("fhash"))

  /** M9 stage 2: segment a (media_id, frame_idx, fhash) stream into
    * scenes — the batch twin of the R20 stateful face.
    */
  private[graft] def scenesFromHashes(frames: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
    frames
      .withColumn("prev", lag(col("fhash"), 1).over(w))
      .withColumn("hamming", when(col("prev").isNull, lit(null))
        .otherwise(
          graft.functions.HammingDistance(col("fhash"), col("prev"))))
      .withColumn("cut",
        when(col("prev").isNull.or(col("hamming") > SceneCutBits), 1L)
          .otherwise(0L))
      .withColumn("scene_id", sum(col("cut")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("media_id"), col("scene_id"))
      .agg(min(col("frame_idx")).cast("long").as("start_frame"),
        max(col("frame_idx")).cast("long").as("end_frame"),
        count(lit(1)).as("n_scene_frames"),
        max(when(col("cut") === 1L, coalesce(col("hamming"), lit(0L))))
          .as("cut_hamming"))
      .orderBy(col("media_id"), col("scene_id"))
  }

  private[media] def scenesOn(docs: DataFrame): DataFrame =
    scenesFromHashes(frameHashes(docs))

  def mediaScenes(s: SparkSession, dir: String): DataFrame =
    scenesOn(Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"), col("text")))

  val mediaScenesSql: String = s"""
    WITH m AS (
      SELECT doc_id AS media_id, text, length(text) AS len,
             (length(text) % 9 + 4)::INT AS n_frames
      FROM documents),
    fr AS (
      SELECT media_id, text,
             greatest(1, len // (n_frames + 3)) AS seg,
             unnest(range(1, n_frames + 1)) AS frame_idx
      FROM m),
    fw AS (
      SELECT media_id, frame_idx,
             substring(text, ((frame_idx-1)*seg+1)::INT, (4*seg)::INT)
               AS fwin
      FROM fr),
    px AS (
      SELECT media_id, frame_idx,
             list_transform(range(1, 17), i ->
               ('0x' || substring(md5(substring(fwin,
                 ((i-1)*cs+1)::INT, cs::INT)), 1, 2))::BIGINT) AS px
      FROM (SELECT media_id, frame_idx, fwin,
                   greatest(1, (length(fwin) + 15) // 16) AS cs
            FROM fw)),
    h AS (
      SELECT media_id, frame_idx,
             array_to_string(list_transform(px, x ->
               CASE WHEN x * 16 > psum THEN '1' ELSE '0' END), '') AS fhash
      FROM (SELECT media_id, frame_idx, px,
                   list_sum(px)::BIGINT AS psum FROM px)),
    lagged AS (
      SELECT media_id, frame_idx, fhash,
             lag(fhash) OVER (PARTITION BY media_id ORDER BY frame_idx)
               AS prev
      FROM h),
    cuts AS (
      SELECT media_id, frame_idx,
             CASE WHEN prev IS NULL THEN NULL
                  ELSE len(list_filter(range(1, 17), i ->
                    fhash[i] != prev[i]))::BIGINT END AS hamming,
             CASE WHEN prev IS NULL OR
                    len(list_filter(range(1, 17), i -> fhash[i] != prev[i]))
                      > $SceneCutBits
                  THEN 1 ELSE 0 END AS cut
      FROM lagged),
    scenes AS (
      SELECT media_id, frame_idx, hamming, cut,
             sum(cut) OVER (PARTITION BY media_id ORDER BY frame_idx
               ROWS UNBOUNDED PRECEDING)::BIGINT AS scene_id
      FROM cuts)
    SELECT media_id, scene_id,
           min(frame_idx)::BIGINT AS start_frame,
           max(frame_idx)::BIGINT AS end_frame,
           count(*) AS n_scene_frames,
           max(CASE WHEN cut = 1 THEN coalesce(hamming, 0) END)::BIGINT
             AS cut_hamming
    FROM scenes GROUP BY media_id, scene_id
    ORDER BY media_id, scene_id"""

  /** M12: constellation-fingerprint clip matching — the Shazam shape
    * (Wang 2003) as a relational pipeline: content-based retrieval
    * that answers "which track is this clip from, and at what
    * offset?" without ever comparing raw media. Each track's frame
    * sequence yields a deterministic "spectral peak" per frame (the
    * md5 stub discipline: peak = 28-bit word hash mod 256, so a clip
    * EXCERPTED from a track shares its peak subsequence — the
    * property real spectrograms have and the reason the algorithm
    * works); fingerprints pair each anchor peak with its next
    * [[ClipFan]] peaks into (f1, f2, Δt) keys carrying (track, t₁);
    * the corpus index is one such pass; a query clip (a 16-frame
    * window of each query track, re-indexed from 1) fingerprints the
    * same way and JOINS the index on the key; the true source shows
    * a dominant CONSTANT offset t₁_track − t₁_clip, so one count
    * aggregate + per-query top-1 finishes it. Scale: the index is
    * O(frames·fan) narrow integer rows keyed by fingerprint hash;
    * matching is an equi-join on that key plus a map-side-combinable
    * vote count — no media bytes move, no pairwise track comparison
    * exists anywhere. Every stage is exact integers; the gate's
    * expected answer (self-track at offset [[ClipFrom]]−1, votes =
    * the in-window fingerprint count) is hash-verified.
    */
  val ClipFrames = 60 // frames indexed per track
  val ClipFan = 3     // fingerprint fan-out window
  val ClipFrom = 5    // clip = frames [5, 20] of each query track
  val ClipTo = 20

  private[graft] def peaksOf(df: DataFrame,
      maxT: org.apache.spark.sql.Column): DataFrame = df
    .select(col("media_id"), col("w"),
      explode(expr(s"sequence(1, least(size(w), $ClipFrames))")).as("t"))
    .filter(col("t") <= maxT)
    .select(col("media_id"), col("t"),
      (conv(substring(md5(expr("element_at(w, t)")), 1, 7), 16, 10)
        .cast("long") % 256).as("f"))

  /** Row-local fingerprinting of a (media_id, w) clip frame — the
    * streaming-safe form: a clip is ONE row carrying its whole frame
    * sequence, so its (f1, f2, Δt) pairs fold out of higher-order
    * transforms with no self-join (a stream-stream join is exactly
    * what update-mode ingest can't do). Emits the same
    * (media_id, fkey, t1) rows as [[fingerprints]] over
    * [[peaksOf]] — R31 leans on that equivalence.
    */
  private[graft] def fingerprintsRowLocal(clips: DataFrame): DataFrame = {
    def fAt(t: String) =
      "cast(conv(substring(md5(element_at(w, " + t +
        ")), 1, 7), 16, 10) as bigint) % 256"
    val fpExpr =
      "flatten(transform(sequence(1, n), t -> " +
        "CASE WHEN n - t < 1 THEN " +
        "cast(array() as array<struct<fkey:bigint,t1:int>>) ELSE " +
        s"transform(sequence(1, least($ClipFan, n - t)), dt -> " +
        "struct((" + fAt("t") + ") * 1000000 + (" + fAt("t + dt") +
        ") * 1000 + dt as fkey, t as t1)) END))"
    clips
      .withColumn("n", expr(s"least(size(w), $ClipFrames)"))
      .select(col("media_id"), explode(expr(fpExpr)).as("fp"))
      .select(col("media_id"), col("fp.fkey"), col("fp.t1"))
  }

  private[graft] def fingerprints(peaks: DataFrame): DataFrame = {
    val anchors = peaks.select(col("media_id"), col("t").as("t1"),
        col("f").as("f1"),
        explode(expr(s"sequence(1, $ClipFan)")).as("dt"))
      .withColumn("t", col("t1") + col("dt"))
    anchors.join(peaks.select(col("media_id"), col("t"),
        col("f").as("f2")), Seq("media_id", "t"))
      .select(col("media_id"),
        (col("f1") * 1000000L + col("f2") * 1000L + col("dt")).as("fkey"),
        col("t1"))
  }

  def mediaClipMatch(s: SparkSession, dir: String): DataFrame = {
    val tracks = Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"),
        split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= ClipTo)
    val peaks = graft.CachedFrames.persist(
      peaksOf(tracks, lit(ClipFrames)))
    val index = fingerprints(peaks)
    val clipPeaks = peaks
      .filter(col("media_id") < 10 &&
        col("t").between(ClipFrom, ClipTo))
      .select(col("media_id").as("q_id"),
        (col("t") - (ClipFrom - 1)).as("t"), col("f"))
    val clipFps = fingerprints(
        clipPeaks.withColumnRenamed("q_id", "media_id"))
      .select(col("media_id").as("q_id"), col("fkey"),
        col("t1").as("tc"))
    val votes = clipFps
      .join(index.hint("shuffle_hash"), Seq("fkey"))
      .groupBy(col("q_id"), col("media_id"),
        (col("t1") - col("tc")).as("t_offset"))
      .agg(count(lit(1)).as("votes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("votes").desc, col("media_id"), col("t_offset"))
    votes.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("q_id"), col("media_id").as("matched_track"),
        col("t_offset"), col("votes"))
      .orderBy(col("q_id"))
  }

  val mediaClipMatchSql: String = s"""
    WITH tracks AS (
      SELECT doc_id AS media_id, string_split(text, ' ') AS w
      FROM documents WHERE len(string_split(text, ' ')) >= $ClipTo),
    peaks AS (
      SELECT media_id, t,
             ('0x' || substring(md5(w[t]), 1, 7))::BIGINT % 256 AS f
      FROM (SELECT media_id, w,
                   unnest(range(1, least(len(w), $ClipFrames) + 1)) AS t
            FROM tracks)),
    index_fp AS (
      SELECT a.media_id,
             a.f * 1000000 + b.f * 1000 + d.dt AS fkey, a.t AS t1
      FROM peaks a
      CROSS JOIN (SELECT unnest(range(1, $ClipFan + 1)) AS dt) d
      JOIN peaks b ON b.media_id = a.media_id AND b.t = a.t + d.dt),
    clip_peaks AS (
      SELECT media_id AS q_id, t - ${ClipFrom - 1} AS t, f
      FROM peaks WHERE media_id < 10
        AND t BETWEEN $ClipFrom AND $ClipTo),
    clip_fp AS (
      SELECT a.q_id,
             a.f * 1000000 + b.f * 1000 + d.dt AS fkey, a.t AS tc
      FROM clip_peaks a
      CROSS JOIN (SELECT unnest(range(1, $ClipFan + 1)) AS dt) d
      JOIN clip_peaks b ON b.q_id = a.q_id AND b.t = a.t + d.dt),
    votes AS (
      SELECT c.q_id, i.media_id, i.t1 - c.tc AS t_offset,
             count(*) AS votes
      FROM clip_fp c JOIN index_fp i USING (fkey)
      GROUP BY 1, 2, 3),
    best AS (
      SELECT q_id, media_id, t_offset, votes,
             row_number() OVER (PARTITION BY q_id
               ORDER BY votes DESC, media_id, t_offset) AS rk
      FROM votes)
    SELECT q_id, media_id AS matched_track, t_offset, votes
    FROM best WHERE rk = 1 ORDER BY q_id"""

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_clip_match" -> (mediaClipMatch _),
    "media_scenes" -> (mediaScenes _),
    "media_ahash_dedup" -> (mediaAhashDedup _),
    "media_ahash_clusters" -> (mediaAhashClusters _),
    "media_hash_agreement" -> (mediaHashAgreement _),
    "media_cdc_bytes" -> (mediaCdcBytes _),
    "media_cdc_dedup" -> (mediaCdcDedup _),
    "media_chunk_dedup" -> (mediaChunkDedup _),
    "media_meta" -> (mediaMeta _),
    "media_frames" -> (mediaFrames _),
    "media_chunks" -> (mediaChunks _),
    "media_decode" -> (MediaPipeline.mediaDecode _))

  /** media_decode is intentionally absent: the mapPartitions decode
    * boundary gets the driver's rows-only check + MediaSpec.
    */
  def oracles: Map[String, String] = Map(
    "media_clip_match" -> mediaClipMatchSql,
    "media_scenes" -> mediaScenesSql,
    "media_ahash_dedup" -> mediaAhashDedupSql,
    "media_ahash_clusters" -> mediaAhashClustersSql,
    "media_hash_agreement" -> mediaHashAgreementSql,
    "media_cdc_bytes" -> mediaCdcBytesSql,
    "media_cdc_dedup" -> mediaCdcDedupSql,
    "media_chunk_dedup" -> mediaChunkDedupSql,
    "media_meta" -> mediaMetaSql,
    "media_frames" -> mediaFramesSql,
    "media_chunks" -> mediaChunksSql)
}
