package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Oracle-checked slice of the multimodal surface: metadata derivation over
  * opaque binary payloads (deterministic dims from payload size — the
  * schema/metadata path the 100 TB pipeline shuffles on). The real
  * javax.imageio decode and the byte-level resize/crop/mirror kernels are
  * exercised by MultimodalSpec (image fixtures are generated in-test; the
  * documents table holds text payloads, not media).
  */
object MultimodalOps {

  /** Q33 — media metadata: payload size → stub dims → pixel counts, grouped
    * stats per language "modality". Map + tight-key agg.
    */
  val q33MultimodalMeta: QueryDef = QueryDef.sql(
    "q33_multimodal_meta",
    """SELECT label, count(*) AS n_samples,
      |  CAST(sum(n_pixels) AS BIGINT) AS total_pixels, max(width) AS max_width,
      |  min(height) AS min_height
      |FROM (
      |  SELECT lang AS label,
      |    1 + octet_length(encode(text)) % 64 AS width,
      |    1 + (octet_length(encode(text)) // 64) % 64 AS height,
      |    (1 + octet_length(encode(text)) % 64) * (1 + (octet_length(encode(text)) // 64) % 64) * 3 AS n_pixels
      |  FROM documents)
      |GROUP BY label
      |ORDER BY label""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .select(col("lang").as("label"),
        (lit(1) + octet_length(col("text")) % 64).as("width"),
        (lit(1) + expr("(octet_length(text) div 64) % 64")).as("height"))
      .withColumn("n_pixels", col("width") * col("height") * 3)
      .groupBy("label")
      .agg(count(lit(1)).as("n_samples"),
        sum(col("n_pixels")).as("total_pixels"),
        max(col("width")).as("max_width"),
        min(col("height")).as("min_height"))
      .orderBy("label")
  }

  val all: Seq[QueryDef] = Seq(q33MultimodalMeta)
}
