package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** Multimodal-column plumbing (north-star extension): treat media as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction as a per-partition batch stage.
  *
  * The decode step is STUBBED (deterministic fake — no image/audio
  * libraries ship in this container, per the builder brief); everything
  * around it — binary column handling, schema, partition-batched
  * processing shape, feature output — is real Spark plumbing. On a
  * cluster the `mapPartitions` stage is where a vectorized decoder
  * (JNI/native batch API) would slot in, amortizing per-batch setup
  * across each partition's rows, exactly like a Python `mapInPandas`
  * batch UDF would.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
      checksum: Long, feat_mean: Double, width: Int, height: Int)

  /** Synthesize a media table from `documents`: text bytes as the opaque
    * payload (stand-in for image/audio bytes), typed metadata derived
    * deterministically. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** STUB decoder: deterministic fake features from the payload bytes.
    * A real deployment replaces only this function body with e.g. a
    * JPEG decode + resize; signature and batching shape stay. */
  private def decodeStub(row: MediaRow): MediaFeatures = {
    val bytes = row.payload
    var checksum = 1125899906842597L
    var i = 0
    var sum = 0L
    while (i < bytes.length) {
      checksum = checksum * 31 + bytes(i)
      sum += (bytes(i) & 0xff)
      i += 1
    }
    val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
    // floor(x*100+0.5)/100, not rint: identical in every engine (rint is
    // HALF_EVEN on binary doubles; DuckDB ROUND is not) — keeps the
    // feature soundness oracle exact
    // fake dimensions derived from content (a real decoder reads headers)
    MediaFeatures(row.doc_id, row.media_type, bytes.length, checksum,
      math.floor(mean * 100 + 0.5) / 100, 16 + (checksum & 0x3f).toInt, 16 + ((checksum >> 6) & 0x3f).toInt)
  }

  /** Decode + feature-extract, batched per partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup would init the native decoder once here
      rows.map(decodeStub)
    }
  }

  /** Feature table over the synthesized media column, per-type stats. */
  val features: GraftQuery = GraftQuery.rowsOnly("ns_mm_features") { (spark, dir) =>
    extractFeatures(mediaTable(spark, dir)).toDF().orderBy("doc_id")
  }

  /** The decode stub's CHECKABLE projection: everything except the
    * synthetic checksum-derived fields (n_bytes and the per-byte mean)
    * re-derived in DuckDB from the raw text — so the typed-Dataset
    * `mapPartitions` decode path is cross-checked against a pure SQL
    * recomputation (JVM loop vs list algebra). The ASCII corpus makes
    * bytes == chars == ascii codes on both sides. */
  val featuresSound: GraftQuery = GraftQuery.checked("ns_mm_features_sound",
    """SELECT doc_id,
           CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           CAST(strlen(text) AS INTEGER) AS n_bytes,
           FLOOR(list_sum(list_transform(range(1, strlen(text) + 1),
             i -> ascii(text[i:i]))) / strlen(text) * 100 + 0.5) / 100 AS feat_mean
    FROM documents WHERE strlen(text) > 0 ORDER BY doc_id""") { (spark, dir) =>
    extractFeatures(mediaTable(spark, dir)).toDF()
      .where(col("n_bytes") > 0)
      .select("doc_id", "media_type", "n_bytes", "feat_mean")
      .orderBy("doc_id")
  }

  final case class Frame(doc_id: Long, frame_idx: Int, n_bytes: Int, checksum: Long)

  /** Frame sampling: every `stride`-th fixed-size chunk of the payload
    * becomes a "frame" row (the explode-shaped expansion a video
    * pipeline uses; a real decoder yields keyframes instead of byte
    * windows — only the chunking stub changes). Partition-batched like
    * [[extractFeatures]]. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 64, stride: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "video").flatMap { row =>
      val b = row.payload
      val nFrames = math.max(1, b.length / frameBytes)
      (0 until nFrames by stride).map { i =>
        val start = i * frameBytes
        val end = math.min(start + frameBytes, b.length)
        var ck = 1125899906842597L
        var j = start
        while (j < end) { ck = ck * 31 + b(j); j += 1 }
        Frame(row.doc_id, i, end - start, ck)
      }
    }
  }

  /** "Resize": deterministic downsample of the payload to a fixed byte
    * budget (every k-th byte) — the shape of an image-resize stage;
    * a real implementation swaps in an actual scaler. */
  def resize(media: Dataset[MediaRow], targetBytes: Int = 256): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { row =>
      val b = row.payload
      if (b.length <= targetBytes) row
      else {
        val step = b.length.toDouble / targetBytes
        val out = Array.tabulate(targetBytes)(i => b((i * step).toInt))
        row.copy(payload = out)
      }
    }
  }

  /** Sampled-frame inventory per video doc. */
  val frames: GraftQuery = GraftQuery.rowsOnly("ns_mm_frames") { (spark, dir) =>
    sampleFrames(mediaTable(spark, dir)).toDF().orderBy("doc_id", "frame_idx")
  }

  /** The frame sampler's CHECKABLE projection — the chunking arithmetic
    * (which docs are video, how many frames, each frame's byte span)
    * re-derived in DuckDB; only the fake checksum stays Spark-only. */
  val framesSound: GraftQuery = GraftQuery.checked("ns_mm_frames_sound",
    """SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
           CAST(LEAST(i * 64 + 64, strlen(text)) - i * 64 AS INTEGER) AS n_bytes
    FROM (SELECT doc_id, text,
            unnest(range(0, GREATEST(1, CAST(floor(strlen(text) / 64.0) AS BIGINT)), 4)) AS i
          FROM documents WHERE doc_id % 3 = 2)
    ORDER BY doc_id, frame_idx""") { (spark, dir) =>
    sampleFrames(mediaTable(spark, dir)).toDF()
      .select("doc_id", "frame_idx", "n_bytes")
      .orderBy("doc_id", "frame_idx")
  }

  /** Aggregated per-media-type feature summary — oracle-checkable
    * because n_bytes == n_chars (payload is the utf-8 text) and the
    * type assignment is pure column algebra. */
  val typeSummary: GraftQuery = GraftQuery.checked("ns_mm_type_summary",
    """SELECT CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_bytes
    FROM documents GROUP BY media_type ORDER BY media_type""") { (spark, dir) =>
    extractFeatures(mediaTable(spark, dir)).toDF()
      .groupBy("media_type")
      .agg(count(lit(1)).as("n"), sum("n_bytes").as("total_bytes"))
      .orderBy("media_type")
  }

  /** PAIRED-MODALITY curation propagation — the cross-table op every
    * CLIP-style paired corpus needs and the only documents⋈embeddings
    * bridge in the registry: the TEXT side's quality verdict
    * ([[TextOps.qualityFilter]], reused verbatim — composition of
    * registered operators, the capstone convention) propagates to the
    * paired VECTOR store (vec_id = doc_id, the paired-corpus
    * contract), so the vector index can drop exactly the embeddings
    * whose source text failed curation WITHOUT re-featurizing
    * anything. Output = the per-(lang, label) keep/drop tally the
    * index-maintenance job reads.
    *
    * Scale shape: the gate is a map stage over documents; the bridge
    * is a 1:1 equi-join on the shared id (both tables id-bucketed at
    * rest → exchange-free, the [[ScaleOps.writeBucketed]] layout);
    * the tally partial-aggregates to |langs|×|labels| rows per task. */
  val pairedGate: GraftQuery = GraftQuery.checked("ns_mm_paired_gate",
    s"""WITH b AS (
      SELECT doc_id, lang,
             CAST(len(toks) AS INTEGER) AS n_tokens,
             (CAST(n_chars AS DOUBLE) - len(toks) + 1) / len(toks) AS awl,
             CAST(len(list_filter(toks, w -> w IN ('the', 'a', 'an', 'of', 'to', 'and', 'in', 'is'))) AS DOUBLE)
               / len(toks) AS stop_ratio,
             CASE WHEN len(toks) > 2
                  THEN 1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks) - 1),
                         i -> array_to_string(toks[i:i+2], ' ')))) AS DOUBLE) / (len(toks) - 2)
                  ELSE 1.0 END AS rep_frac
      FROM (SELECT doc_id, lang, n_chars,
              list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS toks
            FROM documents)),
    gate AS (
      SELECT doc_id, lang,
             CASE WHEN n_tokens >= 40 AND awl >= 3.0 AND awl <= 10.0
                   AND stop_ratio >= 0.01 AND rep_frac <= 0.2
                  THEN 1 ELSE 0 END AS keep
      FROM b)
    SELECT g.lang, e.label,
           CAST(SUM(g.keep) AS BIGINT) AS n_kept,
           CAST(SUM(1 - g.keep) AS BIGINT) AS n_dropped
    FROM gate g JOIN embeddings e ON e.vec_id = g.doc_id
    GROUP BY g.lang, e.label
    ORDER BY lang, label""") { (spark, dir) =>
    val gate = TextOps.qualityFilter.run(spark, dir).select(col("doc_id"), col("keep"))
    val langs = Tables.documents(spark, dir).select("doc_id", "lang")
    val emb = Tables.embeddings(spark, dir).select(col("vec_id").as("doc_id"), col("label"))
    gate.join(langs, "doc_id").join(emb, "doc_id")
      .groupBy("lang", "label")
      .agg(sum("keep").cast("long").as("n_kept"),
        sum(lit(1) - col("keep")).cast("long").as("n_dropped"))
      .orderBy("lang", "label")
  }

  val all: Seq[GraftQuery] = Seq(features, featuresSound, frames, framesSound, typeSummary,
    pairedGate)
}
