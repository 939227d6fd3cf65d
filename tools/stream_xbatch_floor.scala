// Machinery-floor twin for q_stream_join_xbatch (r19): the SAME
// 3-file replay shape, watermarks, symmetric interval join and
// 8-partition state config, but over a ~200-row synthetic fixture —
// if its wall time ~= the full gate's, the gate's cost is mandated
// micro-batch machinery (trigger + 4 state stores x 8 partitions x
// batch), not sf0.1 data work. Run exactly like stream_floor_probe.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

val root = s"${System.getProperty("java.io.tmpdir")}/graft_floor_xb_${java.lang.ProcessHandle.current().pid()}"
val H = 3600L * 1000L * 1000L * 1000L
def withTime(df: DataFrame): DataFrame = df.withColumn("event_time",
  timestamp_micros(expr("ts_ns div 1000")))
val base = spark.range(100).select(
  col("id").as("event_id"), (col("id") * 1000000L).as("ts_ns"),
  (col("id") % 7).as("user_id"),
  when(col("id") % 2 === 0, "click").otherwise("purchase")
    .as("event_type"))
withTime(base).coalesce(1).write.mode("overwrite").parquet(root)
Thread.sleep(15)
withTime(base.withColumn("event_id", col("event_id") + 1000)
  .withColumn("ts_ns", col("ts_ns") + H)).coalesce(1)
  .write.mode("append").parquet(root)
Thread.sleep(15)
withTime(base.withColumn("event_id", col("event_id") + 2000)
  .withColumn("ts_ns", col("ts_ns") + 4 * H)).coalesce(1)
  .write.mode("append").parquet(root)

def runOnce(i: Int): Double = {
  val schema = spark.read.parquet(root).schema
  def side(t: String) = spark.readStream.schema(schema)
    .option("maxFilesPerTrigger", "1").parquet(root)
    .filter(col("event_type") === t)
  val clicks = side("click")
    .select(col("event_id").as("click_id"), col("user_id"),
      col("event_time").as("c_time"))
    .withWatermark("c_time", "1 hour")
  val purchases = side("purchase")
    .select(col("event_id").as("purchase_id"),
      col("user_id").as("p_user"), col("event_time").as("p_time"))
    .withWatermark("p_time", "1 hour")
  val joined = clicks.join(purchases,
    expr("user_id = p_user AND p_time >= c_time AND " +
      "p_time <= c_time + interval 1 hour"), "left_outer")
  val t0 = System.nanoTime()
  val prev = spark.conf.get("spark.sql.shuffle.partitions")
  spark.conf.set("spark.sql.shuffle.partitions", "8")
  try graft.streaming.StreamingOi.replayAppend(joined,
      s"graft_floor_xb_$i").count()
  finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  (System.nanoTime() - t0) / 1e9
}
runOnce(0) // warm
val walls = (1 to 3).map(runOnce)
val wallsStr = walls.map(w => f"$w%.2f").mkString(", ")
println(f"== tiny-fixture xbatch twin walls: $wallsStr s (min ${walls.min}%.2f)")
System.exit(0)
