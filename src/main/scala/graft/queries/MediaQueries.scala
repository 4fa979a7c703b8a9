package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Media

/** Multimodal plumbing exposed as driver-checkable queries. The payloads are
  * deterministic synthetic blobs (the container has no codec libraries —
  * Media.DecodeStub documents the swap point), so these validate the
  * Spark-side schema/batch/pruning machinery, not codecs. `dir` is unused:
  * the media table is generated, not read from the sf directory.
  *
  * Both queries carry full DuckDB oracles: DecodeStub is pure 64-bit FNV-1a
  * arithmetic over deterministically generated payload bytes, replicated in
  * SQL with HUGEINT mod-2^64 recursion (x18) / integer division (x19).
  */
object MediaQueries {
  import QueryDef.sql

  private val N = 300

  /** Batched per-partition feature extraction over binary payloads.
    *
    * Output is driver-hashable scalars only: the raw ARRAY<FLOAT> feature
    * vector is digested to `feat_sum` (sum of the per-dim values rounded to
    * 6 dp — the oracle-portable float contract), alongside the byte count
    * and the FNV-1a content hash. The oracle recomputes byte `j` of payload
    * `i` as `(i*31 + j*7) % 251` (see Media.syntheticMedia) and folds the
    * same FNV chain in HUGEINT arithmetic. */
  val mediaFeatures = sql(
    "x18_media_features",
    s"""WITH RECURSIVE
      |ch(id, j, len, h) AS (
      |  SELECT i::BIGINT, 0::BIGINT, (64 + i % 32)::BIGINT, 14695981039346656037::HUGEINT
      |  FROM range($N) t(i)
      |  UNION ALL
      |  SELECT id, j+1, len,
      |    (xor(h, ((id*31 + j*7) % 251)::HUGEINT) * 1099511628211::HUGEINT)
      |      % 18446744073709551616::HUGEINT
      |  FROM ch WHERE j < len
      |),
      |chash AS (SELECT id, len, h FROM ch WHERE j = len),
      |fh(id, len, k, h, fsum) AS (
      |  SELECT i::BIGINT, (64 + i % 32)::BIGINT, 0::BIGINT,
      |    14695981039346656037::HUGEINT, 0.0::DOUBLE
      |  FROM range($N) t(i)
      |  UNION ALL
      |  SELECT id, len, k+1,
      |    (xor(h, (((id*31 + ((k % len)*7)) % 251) + k)::HUGEINT) * 1099511628211::HUGEINT)
      |      % 18446744073709551616::HUGEINT,
      |    fsum + ROUND(CAST(CAST(
      |      (((xor(h, (((id*31 + ((k % len)*7)) % 251) + k)::HUGEINT) * 1099511628211::HUGEINT)
      |        % 18446744073709551616::HUGEINT) // 2048::HUGEINT) AS DOUBLE)
      |      / 9007199254740992.0 AS FLOAT)::DOUBLE, 6)
      |  FROM fh WHERE k < 16
      |),
      |feats AS (SELECT id, fsum FROM fh WHERE k = 16)
      |SELECT c.id AS media_id, c.len::INTEGER AS n_bytes,
      |  CASE WHEN c.h >= 9223372036854775808::HUGEINT
      |       THEN (c.h - 18446744073709551616::HUGEINT)::BIGINT ELSE c.h::BIGINT END
      |    AS content_hash,
      |  ROUND(f.fsum, 6) AS feat_sum
      |FROM chash c JOIN feats f USING (id) ORDER BY media_id""".stripMargin) { (s, _) =>
    Media.extractFeatures(Media.syntheticMedia(s, N), dim = 16)
      .select(
        col("media_id"), col("n_bytes"), col("content_hash"),
        round(aggregate(col("features"), lit(0.0),
          (acc, x) => acc + round(x.cast("double"), 6)), 6).as("feat_sum"))
      .orderBy("media_id")
  }

  /** Exploded video-frame sampling feed. Frame offsets are pure integer
    * arithmetic, so the oracle regenerates them directly: video rows are
    * `i % 3 = 2` with duration `1000*(i%10+1)` ms (Media.syntheticMedia). */
  val mediaFrames = sql(
    "x19_media_frames",
    s"""SELECT i::BIGINT AS media_id,
      |  ((1000*(i%10+1))::BIGINT * (2*k+1)) // 8 AS frame_ms
      |FROM range($N) t(i), range(4) u(k)
      |WHERE i % 3 = 2
      |ORDER BY media_id, frame_ms""".stripMargin) { (s, _) =>
    Media.sampleVideoFrames(Media.syntheticMedia(s, N), framesPerVideo = 4)
      .orderBy("media_id", "frame_ms")
  }

  /** Batched image resize feed. Image rows are `i % 3 = 0` with a 32×32
    * fake pixel grid; nearest-neighbor 8×8 samples source pixel
    * p = 128r + 4c, whose stub value is `(i*31 + (p mod len)*7) mod 251`
    * (see Media.syntheticMedia / DecodeStub.resizeImage) — so the oracle
    * regenerates the thumbnail byte sum in pure SQL. */
  val mediaResize = sql(
    "x23_media_resize",
    s"""SELECT i::BIGINT AS media_id, 8 AS out_w, 8 AS out_h,
      |  CAST(SUM((i*31 + ((128*r + 4*c) % (64 + i%32))*7) % 251) AS BIGINT) AS px_sum
      |FROM range($N) t(i), range(8) rr(r), range(8) cc(c)
      |WHERE i % 3 = 0
      |GROUP BY i ORDER BY media_id""".stripMargin) { (s, _) =>
    Media.resizeImages(Media.syntheticMedia(s, N), outW = 8, outH = 8)
      .select("media_id", "out_w", "out_h", "px_sum")
      .orderBy("media_id")
  }

  /** x84: perceptual-hash image near-dup — the multimodal sibling of the
    * text dedup family: 64-bit aHash per image ([[Media.imageHashes]] —
    * thumbnail bit = pixel strictly above the exact integer mean), then
    * banded-LSH candidate pairs (8 bands × 8 bits: a pair within hamming 8
    * almost surely agrees on SOME byte) verified by `bit_count(xor) ≤ 8`.
    * Candidate generation is an EQUI-join on (band idx, band value) —
    * never all-pairs, the x04 SimHash discipline — and the verify runs
    * only on banded candidates. Inputs are [[Media.syntheticMediaWithDups]]
    * (planted twins with a localized +50 payload edit; one twin drifts
    * past the threshold and must be missed; two coincidental thumbnail
    * collisions of the synthetic grid are genuinely within range and are
    * kept). The oracle regenerates thumbnail pixels, the integer-mean bit
    * rule, the HUGEINT hash assembly, the banding, and the hamming verify
    * in pure SQL. */
  val mediaPhashDedup = sql(
    "x84_media_phash_dedup",
    s"""WITH imgs AS (
      |  SELECT i::BIGINT AS media_id, i::BIGINT AS src, 0 AS pert
      |  FROM range($N) t(i) WHERE i % 3 = 0
      |  UNION ALL
      |  SELECT (1000 + i)::BIGINT, i::BIGINT, 1 FROM range($N) t(i) WHERE i % 15 = 0),
      |px AS (
      |  SELECT media_id, (8*r + c)::BIGINT AS idx,
      |    ((src*31 + ((128*r + 4*c) % (64 + src % 32))*7) % 251
      |      + CASE WHEN pert = 1 AND (128*r + 4*c) % (64 + src % 32) < 8
      |             THEN 50 ELSE 0 END) % 251 AS val
      |  FROM imgs, range(8) rr(r), range(8) cc(c)),
      |sums AS (SELECT media_id, SUM(val) AS s FROM px GROUP BY media_id),
      |hu AS (
      |  SELECT px.media_id,
      |    SUM(CASE WHEN val * 64 > s THEN 1::HUGEINT << idx::INTEGER
      |             ELSE 0::HUGEINT END) AS h
      |  FROM px JOIN sums ON px.media_id = sums.media_id GROUP BY px.media_id),
      |hashes AS (
      |  SELECT media_id,
      |    CASE WHEN h >= 9223372036854775808::HUGEINT
      |         THEN (h - 18446744073709551616::HUGEINT)::BIGINT
      |         ELSE h::BIGINT END AS ahash
      |  FROM hu),
      |bands AS (
      |  SELECT media_id, ahash, k, (ahash >> (8*k::INTEGER)) & 255 AS bv
      |  FROM hashes, range(8) kk(k)),
      |cand AS (
      |  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
      |    a.ahash AS ha, b.ahash AS hb
      |  FROM bands a JOIN bands b
      |    ON a.k = b.k AND a.bv = b.bv AND a.media_id < b.media_id)
      |SELECT media_a, media_b,
      |  CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
      |FROM cand WHERE bit_count(xor(ha, hb)) <= 8
      |ORDER BY media_a, media_b""".stripMargin) { (s, _) =>
    Media.phashNearDupPairs(
        Media.imageHashes(Media.syntheticMediaWithDups(s, N)), nBands = 8, tau = 8)
      .orderBy("media_a", "media_b")
  }

  /** x85: EXACT hamming-≤8 image pairs via multi-index hashing
    * ([[Media.phashNearDupPairsMih]] — Norouzi et al. 2012): 16-bit
    * substrings with radius-2 key enumeration, a pigeonhole recall
    * GUARANTEE where x84's 8-bit bands are a recall heuristic. The oracle
    * is deliberately the brute-force ground truth — ALL pairs with
    * `bit_count(xor) ≤ 8`, no banding replicated — so the hash match
    * PROVES the MIH candidate generation misses nothing on this corpus
    * (x84's oracle can only prove the banding was replicated
    * faithfully). */
  val mediaPhashMih = sql(
    "x85_media_phash_mih",
    s"""WITH imgs AS (
      |  SELECT i::BIGINT AS media_id, i::BIGINT AS src, 0 AS pert
      |  FROM range($N) t(i) WHERE i % 3 = 0
      |  UNION ALL
      |  SELECT (1000 + i)::BIGINT, i::BIGINT, 1 FROM range($N) t(i) WHERE i % 15 = 0),
      |px AS (
      |  SELECT media_id, (8*r + c)::BIGINT AS idx,
      |    ((src*31 + ((128*r + 4*c) % (64 + src % 32))*7) % 251
      |      + CASE WHEN pert = 1 AND (128*r + 4*c) % (64 + src % 32) < 8
      |             THEN 50 ELSE 0 END) % 251 AS val
      |  FROM imgs, range(8) rr(r), range(8) cc(c)),
      |sums AS (SELECT media_id, SUM(val) AS s FROM px GROUP BY media_id),
      |hu AS (
      |  SELECT px.media_id,
      |    SUM(CASE WHEN val * 64 > s THEN 1::HUGEINT << idx::INTEGER
      |             ELSE 0::HUGEINT END) AS h
      |  FROM px JOIN sums ON px.media_id = sums.media_id GROUP BY px.media_id),
      |hashes AS (
      |  SELECT media_id,
      |    CASE WHEN h >= 9223372036854775808::HUGEINT
      |         THEN (h - 18446744073709551616::HUGEINT)::BIGINT
      |         ELSE h::BIGINT END AS ahash
      |  FROM hu)
      |SELECT a.media_id AS media_a, b.media_id AS media_b,
      |  CAST(bit_count(xor(a.ahash, b.ahash)) AS INTEGER) AS hamming
      |FROM hashes a JOIN hashes b ON a.media_id < b.media_id
      |WHERE bit_count(xor(a.ahash, b.ahash)) <= 8
      |ORDER BY media_a, media_b""".stripMargin) { (s, _) =>
    Media.phashNearDupPairsMih(
        Media.imageHashes(Media.syntheticMediaWithDups(s, N)), tau = 8)
      .orderBy("media_a", "media_b")
  }

  val all: Seq[QueryDef] = Seq(mediaFeatures, mediaFrames, mediaResize,
    mediaPhashDedup, mediaPhashMih)
}
