package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HashingOverlapper (/root/reference/networkit/cpp/overlap/HashingOverlapper.cpp:
  * 14-93): combine several partitions into one "core" clustering whose subsets are the
  * intersections, by hashing per-node label combinations.
  *
  *   - 2 partitions: key = ((ζ[v] XOR 0xffff) << 16) | (η[v] XOR 0xffff),
  *     core[v] = djb2(key) (HashingOverlapper.cpp:70-72);
  *   - ≥3 partitions: core[v] = Σ_c (djb2((c+2)·ζ_c[v]) & 0xffff)
  *     (HashingOverlapper.cpp:77-86, the allToOne base id is 0);
  *   - then Partition.compact() — here: ascending dense rank of the hash values
  *     (distributed, Layout.zipWithRankBy — no global window).
  *
  * The reference's djb2 walks the LITTLE-ENDIAN BYTES of the 64-bit key and stops at
  * the first zero byte (h = h·33 + b). That sequential loop has the closed form
  * h = 5381·33^p + Σ_{j<p} b_j·33^(p−1−j) with p = index of the first zero byte —
  * a pure column expression (emitted by [[djb2Sql]] in both the Spark and DuckDB
  * dialects, so the oracle replays it bit-for-bit). Max value 5381·33^8 < 2^53:
  * exact in int64 in both engines, no wraparound ever fires.
  */
object Overlap {

  import graft.synth.GraphSpec.idiv

  /** a XOR b — Spark SQL spells it `^`, DuckDB `xor(a,b)` (its `^` is POWER). */
  private def bxor(a: String, b: String, duck: Boolean): String =
    if (duck) s"xor(($a), ($b))" else s"(($a) ^ ($b))"

  /** djb2 over the little-endian bytes of `key` (stop at first zero byte), as a
    * closed-form SQL expression valid in the chosen dialect. `key` must be >= 0. */
  def djb2Sql(key: String, duck: Boolean): String = {
    val k = s"($key)"
    val b = (0 until 8).map(j =>
      s"((${idiv(k, (1L << (8 * j)).toString, duck)}) % 256)")
    val p = "(CASE " +
      (0 until 8).map(j => s"WHEN ${b(j)} = 0 THEN $j").mkString(" ") + " ELSE 8 END)"
    val pow33 = (0 to 8).map(e => math.pow(33.0, e.toDouble).toLong)
    def pw(e: String): String =
      "(CASE " + (0 to 8).map(i => s"WHEN ($e) = $i THEN ${pow33(i)}").mkString(" ") +
        " ELSE 0 END)"
    val lead = s"(5381 * ${pw(p)})"
    val terms = (0 until 8).map(j =>
      s"(CASE WHEN $j < $p THEN ${b(j)} * ${pw(s"$p - 1 - $j")} ELSE 0 END)")
    "(" + (lead +: terms).mkString(" + ") + ")"
  }

  /** The two-partition key ((la XOR 0xffff) << 16) | (lb XOR 0xffff). The OR is
    * a + b − (a & b) so the expression shares both dialects (`&` does). */
  def pairKeySql(la: String, lb: String, duck: Boolean): String = {
    val hi = s"(${bxor(la, "65535", duck)} * 65536)"
    val lo = bxor(lb, "65535", duck)
    s"($hi + ($lo) - ($hi & ($lo)))"
  }

  /** Raw (uncompacted) core id for two partitions. */
  def pairHashSql(la: String, lb: String, duck: Boolean): String =
    djb2Sql(pairKeySql(la, lb, duck), duck)

  /** Raw core contribution of clustering index c (≥3-partition case):
    * djb2((c+2)·label) & 0xffff. */
  def multiHashSql(c: Int, label: String, duck: Boolean): String =
    s"(${djb2Sql(s"${c + 2} * ($label)", duck)} % 65536)"

  /** Combine partitions (each (id, label)) into the core clustering (id, label),
    * labels compacted to ascending dense ranks of the hash values. */
  def hashingOverlapper(spark: SparkSession, parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "at least one partition")
    val raw = parts match {
      case Seq(only) => only.select(col("id"), col("label").as("h"))
      case Seq(a, b) =>
        a.select(col("id"), col("label").as("la"))
          .join(b.select(col("id"), col("label").as("lb")), "id")
          .select(col("id"), expr(pairHashSql("la", "lb", duck = false)).as("h"))
      case many =>
        many.zipWithIndex.map { case (p, c) =>
          p.select(col("id"),
            expr(multiHashSql(c, "label", duck = false)).as(s"h$c"))
        }.reduce(_.join(_, "id"))
          .select(col("id"),
            many.indices.map(c => col(s"h$c")).reduce(_ + _).as("h"))
    }
    val dict = graft.layout.Layout.zipWithRankBy(
      raw.select("h").distinct(), Seq(col("h").asc), "label")
    val out = raw.join(dict, "h").select(col("id"), col("label"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    dict.unpersist()
    out
  }
}
