package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** End-to-end capstone ETL — the reference's `etl.py main()`
  * (etl.py:82–94) re-expressed: read the three raw inputs + the country
  * mapping, clean, build the star schema, QC, write Parquet.
  *
  * Scale/plan differences from the reference (SURVEY §3.1, §4):
  *  - The cleaned immigration table feeds THREE outputs (visa dim,
  *    calendar dim, fact) — it is cached once instead of re-evaluating
  *    its lineage per output (the reference re-reads and re-cleans).
  *  - The visa dim is joined into the fact directly instead of the
  *    reference's write-parquet-then-re-read round trip
  *    (etl_functions.py:75–76).
  *  - No per-step `count()` actions; QC metrics come from one aggregation
  *    pass per table at the end.
  *  - Paths are parameters; no embedded credentials (the reference ships
  *    AWS keys in config.cfg — SURVEY §7.1.7).
  *
  * Usage: `runMain graft.pipeline.CapstoneEtl <inputDir> <outputDir>`
  * where inputDir contains `immigration.csv`, `temperatures.csv`,
  * `demographics.csv` (`;`-delimited), `i94res.csv`.
  */
object CapstoneEtl {

  final case class StarSchemaTables(
      fact: DataFrame, visa: DataFrame, calendar: DataFrame,
      country: DataFrame, demographics: DataFrame)

  /** Readers mirroring SURVEY §2.1 S2–S4, with explicit schemas.
    *
    * `readImmigration` is format-parameterized: the reference ingests
    * `i94_apr16_sub.sas7bdat` through a SAS DataSource (etl.py:24,
    * etl.py:42); no SAS reader exists for Spark 4 in this offline
    * environment, so the default is the CSV fixture seam — but a SAS
    * package drops in as
    * `readImmigration(spark, path, "com.github.saurfang.sas.spark",
    * Map.empty)` with no other code change.
    */
  def readImmigration(spark: SparkSession, path: String,
      format: String = "csv",
      options: Map[String, String] = Map("header" -> "true")): DataFrame =
    spark.read.schema(CapstoneSchemas.immigration)
      .format(format).options(options).load(path)

  def readTemperature(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(CapstoneSchemas.temperature)
      .option("header", "true").csv(path)

  def readDemographics(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(CapstoneSchemas.demographics)
      .option("header", "true").option("sep", ";").csv(path)

  def readCountryCodes(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(CapstoneSchemas.countryCodes)
      .option("header", "true").csv(path)

  /** Build all five star-schema tables from raw inputs. `compat`
    * replays the reference's literal quirks (see [[Compat]]); the
    * default is intended semantics.
    */
  def buildStarSchema(immigrationRaw: DataFrame, temperatureRaw: DataFrame,
      demographicsRaw: DataFrame, countryCodes: DataFrame,
      compat: Compat = Compat.default): StarSchemaTables = {
    val immigration = Clean.cleanImmigration(immigrationRaw).cache()
    val temperature = Clean.cleanTemperature(temperatureRaw)
    val demographics = Clean.cleanDemographics(demographicsRaw)

    val visa = StarSchema.visaTypeDim(immigration)
    StarSchemaTables(
      fact = StarSchema.immigrationFact(immigration, visa, compat),
      visa = visa,
      calendar = StarSchema.calendarDim(immigration, compat),
      country = StarSchema.countryDim(immigration, countryCodes, temperature, compat),
      demographics = StarSchema.demographicsDim(demographics))
  }

  /** Cluster a batch on its hive-partition columns before a
    * `partitionBy` write, so each leaf directory is written by a
    * BOUNDED number of tasks: files ≈ leaves × filesPerLeaf, never
    * tasks × leaves (VERDICT r13 #7 — the classic 100 TB ETL failure:
    * an unclustered 32-task write of a 3-decade calendar produces up
    * to 32 files in every year/month/week directory, and at a
    * 1000-executor scale that is millions of kilobyte files and a
    * metadata-bound table). `filesPerLeaf > 1` adds a deterministic
    * row-hash salt for partitions too large for one file — the knob a
    * real deployment sizes to its target file size (~128 MiB–1 GiB).
    */
  private[graft] def clusterForWrite(df: DataFrame, filesPerLeaf: Int,
      cols: String*): DataFrame = {
    import org.apache.spark.sql.functions._
    val keys = cols.map(col)
    if (filesPerLeaf <= 1) df.repartition(keys: _*)
    else df.repartition(keys :+
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(filesPerLeaf)): _*)
  }

  /** Write the star schema as Parquet; calendar dim hive-partitioned by
    * year/month/week (etl_functions.py:129–130) so downstream date-range
    * readers get partition pruning. Partitioned writes are clustered —
    * see [[clusterForWrite]].
    */
  def writeStarSchema(t: StarSchemaTables, outDir: String,
      filesPerLeaf: Int = 1): Unit = {
    t.fact.write.mode(SaveMode.Overwrite).parquet(s"$outDir/immigration_fact")
    t.visa.write.mode(SaveMode.Overwrite).parquet(s"$outDir/visa_type_dim")
    clusterForWrite(t.calendar, filesPerLeaf,
        "arrival_year", "arrival_month", "arrival_week")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("arrival_year", "arrival_month", "arrival_week")
      .parquet(s"$outDir/immigration_calendar_dim")
    t.country.write.mode(SaveMode.Overwrite).parquet(s"$outDir/country_dim")
    t.demographics.write.mode(SaveMode.Overwrite).parquet(s"$outDir/usa_demographics_dim")
  }

  /** Incremental monthly refresh — the reference's stated cadence
    * (BASELINE.md "monthly"). The fact table is stored partitioned by
    * arrival year/month; a new month's batch overwrites ONLY the
    * partitions it touches (`partitionOverwriteMode=dynamic`), so a
    * 100 TB fact table absorbs a monthly delta with IO proportional to
    * the delta, not the table.
    */
  def mergeMonthlyFact(spark: SparkSession, monthBatch: DataFrame,
      factDir: String, filesPerLeaf: Int = 1): Unit = {
    import org.apache.spark.sql.functions._
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      clusterForWrite(
          monthBatch
            .withColumn("arrival_year", year(col("arrdate")))
            .withColumn("arrival_month", month(col("arrdate"))),
          filesPerLeaf, "arrival_year", "arrival_month")
        .write.mode(SaveMode.Overwrite)
        .partitionBy("arrival_year", "arrival_month")
        .parquet(factDir)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: CapstoneEtl <inputDir> <outputDir>")
    val (in, out) = (args(0), args(1))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("capstone-etl")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tables = buildStarSchema(
      readImmigration(spark, s"$in/immigration.csv"),
      readTemperature(spark, s"$in/temperatures.csv"),
      readDemographics(spark, s"$in/demographics.csv"),
      readCountryCodes(spark, s"$in/i94res.csv"))
    writeStarSchema(tables, out)

    val qc = QualityChecks.checkAll(tables.fact, tables.visa, tables.calendar,
      tables.country, tables.demographics)
    qc.foreach(r => println(s"[qc] ${r.table} ${r.check} count=${r.count} " +
      (if (r.passed) "OK" else "FAIL")))
    if (qc.exists(!_.passed)) sys.exit(1)
    spark.stop()
  }
}
