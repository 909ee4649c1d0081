package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Spark-native file connector pipeline — the Structured-Streaming form
  * of the reference's FileSource/FileSink examples (SURVEY §3.1/§3.2
  * trace): `readStream` over a JSON-lines directory → transform →
  * `foreachBatch` append sink, with the checkpoint directory playing the
  * reference's offset-topic role (S7) and `Trigger.AvailableNow` its
  * drain-and-stop EOF behavior (K7).
  *
  * At-least-once contract (K9): the batch function appends, and Spark
  * writes the checkpoint commit only after it returns — flush strictly
  * before commit, identical to the reference's `_on_flush`.
  */
object FilePipeline {

  /** Streaming source over a directory of JSON-lines files. Schema must
    * be supplied (streaming reads don't infer) — the batch-side one-shot
    * inference mirror (S6): infer once from existing data, then lock. */
  def source(spark: SparkSession, inDir: String,
      schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(inDir)

  /** Infer the locked schema from the data already in the directory
    * (one-shot inference, S6). */
  def inferSchema(spark: SparkSession, inDir: String): StructType =
    spark.read.json(inDir).schema

  /** Run the pipeline until all currently-available input is drained
    * (AvailableNow). Restart with the same checkpoint dir → resumes after
    * the last committed batch, nothing reprocessed.
    *
    * Default sink (`singleFile = false`): Spark's distributed JSON file
    * sink — every executor writes its own partition files under the
    * `out` DIRECTORY and the sink's `_spark_metadata` commit log makes
    * the directory exactly-once across restarts. No row ever moves
    * through the driver, so the path scales to arbitrarily large
    * micro-batches.
    *
    * `singleFile = true` is the CLI-parity mode, matching the reference
    * FileSink's append-to-one-local-file behavior
    * (`examples/file_sink/file_sink.py:34-46`): each micro-batch is
    * collected to the driver and appended to the `out` FILE. Explicitly
    * opt-in and only sane for demo-scale outputs — it is the one
    * driver-side collect in the repo, and it is no longer the default. */
  def run(spark: SparkSession, inDir: String, out: String,
      checkpointDir: String,
      transform: DataFrame => DataFrame = identity,
      singleFile: Boolean = false): StreamingQuery = {
    val schema = inferSchema(spark, inDir)
    val transformed = transform(source(spark, inDir, schema))
    val writer =
      if (singleFile)
        transformed.writeStream.foreachBatch {
          (batch: DataFrame, _: Long) =>
            val lines = batch.toJSON.collect()
            if (lines.nonEmpty)
              java.nio.file.Files.write(
                java.nio.file.Paths.get(out),
                lines.mkString("", "\n", "\n").getBytes("UTF-8"),
                java.nio.file.StandardOpenOption.CREATE,
                java.nio.file.StandardOpenOption.APPEND)
            ()
        }
      else transformed.writeStream.format("json").option("path", out)
    val q = writer
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
