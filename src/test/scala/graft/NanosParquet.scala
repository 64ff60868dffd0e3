package graft

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

/** Test writer for GENUINE parquet TIMESTAMP(NANOS) events files —
  * the encoding the driver's generator has actually shipped and Spark
  * can read (under `nanosAsLong`) but cannot WRITE. Earlier tests
  * faked nanos with a plain int64 column plus the session conf; the
  * per-file footer probe in [[graft.sources.Tables]] now rightly
  * refuses that fake (an unannotated int64 has no epoch unit), so the
  * nanos-path tests must produce the real annotation.
  */
object NanosParquet {

  private val schema: MessageType = Types.buildMessage()
    .required(INT64).named("event_id")
    .required(INT64)
    .as(LogicalTypeAnnotation.timestampType(true,
      LogicalTypeAnnotation.TimeUnit.NANOS))
    .named("ts")
    .required(INT64).named("user_id")
    .required(BINARY).as(LogicalTypeAnnotation.stringType())
    .named("event_type")
    .required(DOUBLE).named("value")
    .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
    .named("events")

  /** Write `rows` = (event_id, tsNanos, user_id, event_type, value,
    * props) as a one-file nanos-annotated events table at `dir`.
    */
  def writeEvents(dir: String,
                  rows: Seq[(Long, Long, Long, String, Double, String)])
      : Unit = {
    new java.io.File(dir).mkdirs()
    val path = new org.apache.hadoop.fs.Path(s"$dir/part-00000.parquet")
    val conf = new Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(path, conf))
      .withType(schema).withConf(conf).build()
    val factory = new SimpleGroupFactory(schema)
    try rows.foreach { case (id, ns, uid, tpe, v, props) =>
      val g = factory.newGroup()
      g.append("event_id", id)
      g.append("ts", ns)
      g.append("user_id", uid)
      g.append("event_type", tpe)
      g.append("value", v)
      g.append("props", props)
      writer.write(g)
    } finally writer.close()
  }
}
