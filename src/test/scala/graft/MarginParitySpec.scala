package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions

/** Cross-engine parity of the multiprobe MARGIN layer.
  *
  * The margin-directed multiprobe (VectorOps.probeBuckets and its DuckDB
  * CTE twin ProbesDuckCtes) assumes the TOTAL ORDER of the 16 per-plane
  * |dot| doubles is bit-identical between Spark's FloatVectorDot and
  * DuckDB's list_dot_product — a strictly stronger requirement than the
  * sign equality the bucket bits need. q34/q53 being oracle-green proves it
  * held for today's kernels; this spec pins it DIRECTLY, so a future change
  * to either kernel's accumulation order fails here, at the margin layer,
  * with the exact diverging (query, plane) pair — not as an opaque q34
  * hash mismatch three layers up.
  *
  * Method: for every recall query vector (vec_id < 8 covers q53's query
  * set and q34's vec_id 0), evaluate |dot(qv, plane_j)| for all 16 planes
  * in both engines and compare RAW DOUBLE BITS (hex of IEEE-754), then the
  * induced (|dot|, j) sort permutation. DuckDB runs through the box's
  * python3 (the same engine the driver's oracle uses); the suite cancels,
  * not fails, where that interpreter is absent.
  */
class MarginParitySpec extends SparkSpec {

  private val nQueries = 8

  test("sorted (|dot|, j) margin lists are bit-identical across engines") {
    val planes = queries.VectorOps.lshPlanes
    val probeBits = queries.VectorOps.lshProbeBits

    // Spark side: the SAME FloatVectorDot expression the bucket/probe
    // derivation uses, abs'd, one column per plane.
    val cols = planes.map(p =>
      abs(VectorExpressions.float_dot(col("embedding"), lit(p.map(_.toFloat).toArray))))
    val sparkRows = Tables(spark, sf, "embeddings")
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id") +: cols: _*)
      .orderBy("vec_id")
      .collect()
      .map(r => r.getLong(0) -> (1 to 16).map(r.getDouble))
    assert(sparkRows.length == nQueries)

    // DuckDB side: abs(list_dot_product) per plane, doubles emitted as
    // big-endian IEEE-754 hex so the comparison is raw bits, not repr.
    val margins = planes.map(p =>
      s"abs(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(${p.mkString("[", ", ", "]")} AS DOUBLE[])))")
      .mkString("[", ", ", "]")
    val py =
      s"""import struct, sys
         |try:
         |    import duckdb
         |except ImportError:
         |    sys.exit(86)
         |rows = duckdb.sql(\"\"\"
         |  SELECT vec_id, $margins AS ms
         |  FROM read_parquet('$sf/embeddings.parquet')
         |  WHERE vec_id < $nQueries ORDER BY vec_id\"\"\").fetchall()
         |for vid, ms in rows:
         |    print(vid, ' '.join(struct.pack('>d', m).hex() for m in ms))
         |""".stripMargin
    val script = java.nio.file.Files.createTempFile("margins", ".py")
    java.nio.file.Files.writeString(script, py)
    val proc = new ProcessBuilder("python3", script.toString)
      .redirectErrorStream(false).start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val code = proc.waitFor()
    assume(code != 86 && code != 127, "python3+duckdb not available on this box")
    assert(code == 0, s"duckdb margin dump failed (exit $code)")

    val duckRows = out.linesIterator.filter(_.nonEmpty).map { line =>
      val parts = line.trim.split("\\s+")
      parts.head.toLong -> parts.tail.toSeq
    }.toMap
    assert(duckRows.size == nQueries)

    sparkRows.foreach { case (vid, sparkDots) =>
      val sparkHex = sparkDots.map(d =>
        f"${java.lang.Double.doubleToLongBits(d)}%016x")
      val duckHex = duckRows(vid)
      // 1) raw bits per (query, plane) — the failure here names the kernel
      (0 until 16).foreach { j =>
        assert(sparkHex(j) == duckHex(j),
          s"margin bits diverge at vec_id=$vid plane=$j: " +
            s"spark=${sparkHex(j)} duck=${duckHex(j)}")
      }
      // 2) the induced probe-selection permutation (what multiprobe consumes)
      val perm = sparkDots.zipWithIndex.sortBy { case (a, j) => (a, j) }.map(_._2)
      val duckPerm = duckHex.map(h => java.lang.Double.longBitsToDouble(
        java.lang.Long.parseUnsignedLong(h, 16))).zipWithIndex
        .sortBy { case (a, j) => (a, j) }.map(_._2)
      assert(perm == duckPerm, s"margin sort order diverges at vec_id=$vid")
      assert(perm.take(probeBits).toSet.size == probeBits)
    }
  }
}
