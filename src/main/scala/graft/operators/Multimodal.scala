package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Num
import graft.{QueryDef, Tables}

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, decoded per-partition.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A STUB —
  * [[FakeDecoder]] is a clearly-marked deterministic fake. Everything
  * around it is the real at-scale Spark shape:
  *  - payloads live in a `BinaryType` column (parquet keeps them as BYTE_ARRAY
  *    pages; metadata columns prune without touching pixels);
  *  - decode runs via `mapPartitions` with an iterator-to-iterator transform
  *    (the Scala analog of `mapInPandas` batching: one decoder init per
  *    partition, streaming through rows, no per-row setup, no collect);
  *  - the output schema is explicit and stable (width/height/channels +
  *    fixed-length feature vector), ready for a downstream ANN join.
  */
object Multimodal {

  /** STUB: deterministic fake decoder. A real deployment swaps this for an
    * actual codec (e.g. javax.imageio / ffmpeg JNI) with the same signature;
    * nothing else changes. */
  trait Decoder extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Double])
  }

  object FakeDecoder extends Decoder {
    /** Pretends the payload is an image: dimensions derived from length,
      * "features" = 8 byte-histogram buckets normalized to [0,1]. */
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Double]) = {
      val w = 64 + (payload.length % 577)
      val h = 64 + ((payload.length / 7) % 409)
      val hist = new Array[Double](8)
      var i = 0
      while (i < payload.length) {
        hist((payload(i) & 0xff) >> 5) += 1.0
        i += 1
      }
      val n = math.max(payload.length, 1).toDouble
      (w, h, 3, hist.map(_ / n))
    }
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false))))

  /** The real plumbing: binary column in, typed decode out, one decoder per
    * partition, iterator-streamed. */
  def decodeImages(payloads: DataFrame, decoder: Decoder = FakeDecoder): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    payloads.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, c, f) = decoder.decode(r.getAs[Array[Byte]]("payload"))
          Row(r.getLong(0), w, h, c, f.toSeq)
        }
      }(enc)
  }

  val resizedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("out_w", IntegerType, nullable = false),
    StructField("out_h", IntegerType, nullable = false),
    StructField("thumb_hex", StringType, nullable = false)))

  /** Resize stub, same mapPartitions shape as [[decodeImages]]: decode →
    * fit-within-maxDim target dims (aspect preserved) → "thumbnail" = the
    * first 16 payload bytes hexed (a real deployment swaps the slice for
    * an actual scaler; dims/schema/batching stay identical). Double math
    * (256.0/w, min, floor) is plain IEEE — bit-identical to the SQL oracle. */
  def resizeImages(payloads: DataFrame, maxDim: Int,
      decoder: Decoder = FakeDecoder): DataFrame = {
    val enc = RowEncoder.encoderFor(resizedSchema)
    payloads.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (w, h, _, _) = decoder.decode(payload)
          val sc = math.min(math.min(maxDim.toDouble / w, maxDim.toDouble / h), 1.0)
          val outW = math.max(1, math.floor(w * sc).toInt)
          val outH = math.max(1, math.floor(h * sc).toInt)
          val thumb = payload.take(16).map("%02X".format(_)).mkString
          Row(r.getLong(0), w, h, outW, outH, thumb)
        }
      }(enc)
  }

  val entries: Seq[QueryDef] = Seq(

    // Binary-column metadata path — payload synthesized from text bytes
    // (no codecs in the container), metadata computed WITHOUT decoding:
    // the pruning-friendly access pattern for 100 TB of media.
    QueryDef("m01_media_meta",
      """SELECT doc_id,
        |       octet_length(encode(text)) AS n_bytes,
        |       md5(text) AS checksum,
        |       CAST(octet_length(encode(text)) % 640 AS INT) AS fake_width,
        |       CAST((octet_length(encode(text)) // 7) % 480 AS INT) AS fake_height
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val nBytes = length(encode(col("text"), "UTF-8")).cast("long")
      Tables.documents(s, d)
        .select(col("doc_id"),
          nBytes.as("n_bytes"),
          md5(col("text")).as("checksum"),
          (nBytes % 640).cast("int").as("fake_width"),
          floor(nBytes / 7).mod(480).cast("int").as("fake_height"))
        .orderBy(col("doc_id"))
    },

    // Frame sampling: N evenly-spaced fixed-width byte slices from each
    // payload — the video-frame/audio-chunk access pattern, pure byte
    // arithmetic on the binary column (no decode, codegen'd both engines).
    QueryDef("m03_frame_sample",
      """WITH p AS (
        |  -- DuckDB can't substring a BLOB: hex the whole payload and slice
        |  -- the hex STRING at 2x byte offsets — byte-exact for ANY input
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS n
        |  FROM documents
        |)
        |SELECT doc_id,
        |       substring(hx, 1, 16) AS frame0,
        |       substring(hx, 2 * CAST(floor(n / 4.0) AS INT) + 1, 16) AS frame1,
        |       substring(hx, 2 * CAST(floor(n / 2.0) AS INT) + 1, 16) AS frame2,
        |       substring(hx, 2 * CAST(floor(3 * n / 4.0) AS INT) + 1, 16) AS frame3
        |FROM p WHERE n >= 32 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val payload = encode(col("text"), "UTF-8")
      val n = length(payload)
      def frame(start: org.apache.spark.sql.Column) =
        hex(payload.substr(start.cast("int") + 1, lit(8)))
      Tables.documents(s, d)
        .select(col("doc_id"),
          frame(lit(0)).as("frame0"),
          frame(floor(n / 4)).as("frame1"),
          frame(floor(n / 2)).as("frame2"),
          frame(floor(n * 3 / 4)).as("frame3"),
          n.as("n"))
        .filter(col("n") >= 32)
        .drop("n")
        .orderBy(col("doc_id"))
    },

    // Resize through the mapPartitions pipeline — oracle-checkable because
    // the stub decoder's dimension math (64 + n % 577, 64 + n//7 % 409)
    // and the fit-within-256 scaling are reproducible in SQL. At scale
    // this is the thumbnailing pass of a media ingest: payload bytes are
    // touched once per partition, dims/metadata flow as columns.
    QueryDef("m04_resize_stub",
      """WITH p AS (
        |  SELECT doc_id, encode(text) AS payload,
        |         octet_length(encode(text)) AS n
        |  FROM documents
        |), dims AS (
        |  SELECT doc_id, hex(payload) AS hx,
        |         CAST(64 + n % 577 AS INT) AS w,
        |         CAST(64 + (n // 7) % 409 AS INT) AS h
        |  FROM p
        |), s AS (
        |  SELECT *, least(256.0 / w, 256.0 / h, 1.0) AS sc FROM dims
        |)
        |SELECT doc_id, w AS width, h AS height,
        |       CAST(greatest(1, floor(w * sc)) AS INT) AS out_w,
        |       CAST(greatest(1, floor(h * sc)) AS INT) AS out_h,
        |       substring(hx, 1, 32) AS thumb_hex
        |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
      val payloads = Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      resizeImages(payloads, 256).orderBy(col("doc_id"))
    },

    // The mapPartitions decode pipeline (STUBBED decoder, real plumbing).
    // Oracle-checkable after all (ADVICE r03): the stub's feature vector is
    // a byte histogram bucketed by (byte >> 5), i.e. by the FIRST HEX
    // NIBBLE >> 1 — so DuckDB reproduces f0/f1 by counting hex-pair lead
    // chars ('0','1' → bucket 0; '2','3' → bucket 1) over the same payload
    // bytes, divided as IEEE doubles. Dimension math identical to m04.
    QueryDef("m02_decode_stub",
      """WITH p AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS n
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, n,
        |         len(list_filter(range(n),
        |             i -> substring(hx, 2 * CAST(i AS INT) + 1, 1) IN ('0', '1'))) AS c0,
        |         len(list_filter(range(n),
        |             i -> substring(hx, 2 * CAST(i AS INT) + 1, 1) IN ('2', '3'))) AS c1
        |  FROM p
        |)
        |SELECT doc_id,
        |       CAST(64 + n % 577 AS INT) AS width,
        |       CAST(64 + (n // 7) % 409 AS INT) AS height,
        |       CAST(3 AS INT) AS channels,
        |       round(1e-9 + CAST(c0 AS DOUBLE) / greatest(n, 1), 6) AS f0,
        |       round(1e-9 + CAST(c1 AS DOUBLE) / greatest(n, 1), 6) AS f1
        |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      val payloads = Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      decodeImages(payloads)
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          Num.roundOut(element_at(col("features"), 1), 6).as("f0"),
          Num.roundOut(element_at(col("features"), 2), 6).as("f1"))
        .orderBy(col("doc_id"))
    },

    // Paired-dataset AUDIT: the integrity check every text↔embedding
    // (caption↔image-vector) corpus runs before training — full outer join
    // of the two modality tables on id, one-row report of paired /
    // text-only / vector-only counts plus a dimension check on the vector
    // side. One co-partitioned join + a global partial-agg; no modality's
    // payload column is ever read (column pruning keeps the scan to ids +
    // the array length).
    QueryDef("m05_pair_audit",
      """SELECT count(CASE WHEN d.doc_id IS NOT NULL AND e.vec_id IS NOT NULL
        |                  THEN 1 END) AS n_paired,
        |       count(CASE WHEN e.vec_id IS NULL THEN 1 END) AS n_text_only,
        |       count(CASE WHEN d.doc_id IS NULL THEN 1 END) AS n_vec_only,
        |       count(CASE WHEN len(e.embedding) = 64 THEN 1 END) AS n_dim_ok
        |FROM documents d FULL JOIN embeddings e
        |  ON d.doc_id = e.vec_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val vecs = Tables.embeddings(s, d)
        .select(col("vec_id"), size(col("embedding")).as("dim"))
      docs.join(vecs, col("doc_id") === col("vec_id"), "full_outer")
        .agg(
          count(when(col("doc_id").isNotNull && col("vec_id").isNotNull, 1))
            .as("n_paired"),
          count(when(col("vec_id").isNull, 1)).as("n_text_only"),
          count(when(col("doc_id").isNull, 1)).as("n_vec_only"),
          count(when(col("dim") === 64, 1)).as("n_dim_ok"))
    },

    // Payload QUARANTINE: the corrupt-file triage a media ingest runs
    // before decoding anything — classify every payload from bytes the
    // scan already has (length + head bytes), never the full content.
    // Rules, first match wins: truncated (under a plausible container
    // minimum), bad_header (first byte outside the expected magic range —
    // printable ASCII for this synthetic corpus; a real ingest whitelists
    // PNG/JPEG/RIFF magics the same way), oversize (relative to the corpus
    // median, a tiny scalar broadcast). Two-hex-char comparisons are
    // numeric because hex digits sort lexicographically. At scale: one
    // pass, one KB-sized median broadcast, quarantined files routed out
    // before the expensive decode stage ever sees them.
    QueryDef("m06_quarantine",
      """WITH p AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n,
        |         hex(encode(text)) AS hx
        |  FROM documents
        |), m AS (
        |  SELECT median(CAST(n AS DOUBLE)) AS med FROM p
        |)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
        |       substring(hx, 1, 16) AS head_hex,
        |       CASE WHEN n < 64 THEN 'truncated'
        |            WHEN NOT (substring(hx, 1, 2) BETWEEN '20' AND '7E')
        |              THEN 'bad_header'
        |            WHEN n > 1.5 * med THEN 'oversize'
        |            ELSE 'ok' END AS status
        |FROM p, m ORDER BY doc_id""".stripMargin) { (s, d) =>
      val p = Tables.documents(s, d)
        .select(col("doc_id"),
          length(encode(col("text"), "UTF-8")).cast("long").as("n"),
          hex(encode(col("text"), "UTF-8").substr(1, 8)).as("head_hex"),
          hex(encode(col("text"), "UTF-8").substr(1, 1)).as("b0"))
      val med = p.agg(median(col("n").cast("double")).as("med"))
      p.crossJoin(broadcast(med))
        .select(col("doc_id"), col("n").as("n_bytes"), col("head_hex"),
          when(col("n") < 64, "truncated")
            .when(!col("b0").between("20", "7E"), "bad_header")
            .when(col("n") > lit(1.5) * col("med"), "oversize")
            .otherwise("ok").as("status"))
        .orderBy(col("doc_id"))
    },

    // MULTIMODAL BATCH ASSEMBLY — the training-batch output a multimodal
    // pipeline exists to produce: text items (cost = token count) and
    // their paired image items (cost = 64 patch tokens, the fixed vision
    // budget per image; pairing = m05's doc_id↔vec_id join) interleaved
    // into 4096-token batches. Deterministic global order (doc_id, then
    // image-before-text within a doc), x18's shard-partitioned running-
    // sum binning, and per-batch MODALITY stats — the text/image token
    // mix per batch is what a trainer's data-loader contract specifies.
    //
    // Scale: the union is item-rows only (costs + tags, never payloads);
    // packing windows run per content-hash shard (x18's fix — no global
    // window); the pairing join is key-equal on ids. Payload bytes move
    // at trainer fetch time, batch manifests move here.
    QueryDef("m07_batch_assembly",
      s"""WITH t AS (
        |  SELECT doc_id, CAST(${TextAnalysis.fingerprintSql} % 4 AS INT) AS shard,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS cost,
        |         'text' AS modality
        |  FROM documents
        |), im AS (
        |  SELECT t.doc_id, t.shard, CAST(64 AS BIGINT) AS cost,
        |         'image' AS modality
        |  FROM t JOIN embeddings e ON e.vec_id = t.doc_id
        |), it AS (
        |  SELECT * FROM t UNION ALL SELECT * FROM im
        |), c AS (
        |  SELECT shard, modality, cost,
        |         sum(cost) OVER (PARTITION BY shard ORDER BY doc_id, modality
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cost
        |           AS cum_before
        |  FROM it
        |)
        |SELECT shard, CAST(floor(cum_before / 4096.0) AS INT) AS bin,
        |       count(*) AS n_items,
        |       CAST(sum(CASE WHEN modality = 'text' THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_text,
        |       CAST(sum(CASE WHEN modality = 'image' THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_image,
        |       CAST(sum(CASE WHEN modality = 'text' THEN cost ELSE 0 END)
        |            AS BIGINT) AS text_tokens,
        |       CAST(sum(CASE WHEN modality = 'image' THEN cost ELSE 0 END)
        |            AS BIGINT) AS image_tokens,
        |       CAST(sum(cost) AS BIGINT) AS bin_tokens
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val t = Tables.documents(s, d)
        .join(TextAnalysis.fingerprintTable(s, d), "doc_id")
        .select(col("doc_id"), (col("fp") % 4).cast("int").as("shard"),
          size(split(col("text"), " ")).cast("long").as("cost"),
          lit("text").as("modality"))
      val im = t.join(Tables.embeddings(s, d),
          col("vec_id") === col("doc_id"))
        .select(col("doc_id"), col("shard"), lit(64L).as("cost"),
          lit("image").as("modality"))
      val w = Window.partitionBy(col("shard"))
        .orderBy(col("doc_id"), col("modality"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.unionAll(im)
        .withColumn("cum_before", sum(col("cost")).over(w) - col("cost"))
        .select(col("shard"),
          floor(col("cum_before") / 4096.0).cast("int").as("bin"),
          col("modality"), col("cost"))
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_items"),
          sum(when(col("modality") === "text", 1L).otherwise(0L)).as("n_text"),
          sum(when(col("modality") === "image", 1L).otherwise(0L)).as("n_image"),
          sum(when(col("modality") === "text", col("cost")).otherwise(0L))
            .as("text_tokens"),
          sum(when(col("modality") === "image", col("cost")).otherwise(0L))
            .as("image_tokens"),
          sum(col("cost")).as("bin_tokens"))
        .orderBy(col("shard"), col("bin"))
    }
  )
}
