package graft.queries

import graft.multimodal.Media

/** Multimodal plumbing exposed as driver-checkable queries. The payloads are
  * deterministic synthetic blobs (the container has no codec libraries —
  * Media.DecodeStub documents the swap point), so these validate the
  * Spark-side schema/batch/pruning machinery, not codecs. `dir` is unused:
  * the media table is generated, not read from the sf directory.
  */
object MediaQueries {
  import QueryDef.rowsOnly

  /** Batched per-partition feature extraction over binary payloads. */
  val mediaFeatures = rowsOnly("x18_media_features") { (s, _) =>
    Media.extractFeatures(Media.syntheticMedia(s, 300), dim = 16)
      .orderBy("media_id")
  }

  /** Metadata-only aggregate (scan must prune the payload column) plus the
    * exploded video-frame sampling feed. */
  val mediaFrames = rowsOnly("x19_media_frames") { (s, _) =>
    Media.sampleVideoFrames(Media.syntheticMedia(s, 300), framesPerVideo = 4)
      .orderBy("media_id", "frame_ms")
  }

  val all: Seq[QueryDef] = Seq(mediaFeatures, mediaFrames)
}
