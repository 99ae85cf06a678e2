package graft.plans

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Properties
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Wave-atomic checkpointing (SURVEY §4.3-6; reference state files S6:
 * mq.status / task.status / budget / bloom bits → here one committed
 * manifest per wave over immutable parquet).
 *
 * Commit protocol: all of a wave's outputs (frontier, seen_delta,
 * schedule, dead, lineage, metrics, results) are written under
 * `<dir>/wave=<k>/...`, then a small manifest file is atomically moved
 * into `<dir>/manifest/wave-<k>.properties`. A wave without its manifest
 * is invisible — resume reads the max committed wave and continues
 * without re-fetching or reordering (the continuation depends only on
 * committed state; kill-resume equivalence is asserted by CrawlJobSpec).
 * Iceberg would give the same semantics via snapshot commits; the runtime
 * has no iceberg jars (checked), so this parquet+manifest fallback per
 * SURVEY §7.4-5.
 */
final class Checkpoint(spark: SparkSession, val dir: String) {

  private val manifestDir: Path = Paths.get(dir, "manifest")
  Files.createDirectories(manifestDir)

  def waveDir(w: Int): String = s"$dir/wave=$w"

  def write(df: DataFrame, w: Int, name: String): Unit =
    df.write.mode("overwrite").parquet(s"${waveDir(w)}/$name")

  def read(w: Int, name: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(s"${waveDir(w)}/$name")

  /** Union of a per-wave table across committed waves [0, upTo]. */
  def readAll(upTo: Int, name: String, schema: StructType): DataFrame = {
    val paths = (0 to upTo).map(w => s"${waveDir(w)}/$name")
      .filter(p => Files.exists(Paths.get(p)))
    if (paths.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(paths: _*)
  }

  def commit(w: Int, state: Map[String, String]): Unit = {
    val props = new Properties()
    state.foreach { case (k, v) => props.setProperty(k, v) }
    props.setProperty("wave", w.toString)
    val tmp = manifestDir.resolve(s".wave-$w.tmp")
    val out = Files.newOutputStream(tmp)
    try props.store(out, null) finally out.close()
    Files.move(tmp, manifestDir.resolve(f"wave-$w%05d.properties"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  def latestWave: Option[Int] = {
    if (!Files.exists(manifestDir)) return None
    val waves = Files.list(manifestDir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("wave-") && s.endsWith(".properties") =>
        s.stripPrefix("wave-").stripSuffix(".properties").toInt }
      .toSeq
    if (waves.isEmpty) None else Some(waves.max)
  }

  def manifest(w: Int): Map[String, String] = {
    val p = manifestDir.resolve(f"wave-$w%05d.properties")
    val props = new Properties()
    val in = Files.newInputStream(p)
    try props.load(in) finally in.close()
    props.stringPropertyNames().asScala.map(k => k -> props.getProperty(k)).toMap
  }

  /** Drop any uncommitted wave directories > latest manifest (crash debris). */
  def cleanUncommitted(): Unit = {
    val latest = latestWave.getOrElse(-1)
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("wave="))
      .filter(p => p.getFileName.toString.stripPrefix("wave=").toInt > latest)
      .foreach(deleteRecursively)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toSeq.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
