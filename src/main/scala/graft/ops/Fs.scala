package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The ONE copy of the Hadoop-filesystem helpers every store-path
  * touches (index roots may live on HDFS/S3 — `java.io.File` probes
  * and fresh `new Configuration()` instances silently misbehave
  * there: wrong auth, wrong defaults, hidden tombstones). All entry
  * points source the SESSION's Hadoop configuration so
  * `spark.hadoop.*` settings apply. */
private[graft] object Fs {

  def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def delete(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Create (or truncate) an empty marker file — the durable
    * "operation in flight" flag store protocols leave before a
    * multi-step overwrite and remove after it commits. */
  def touch(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(p, true).close()
  }

  /** Hadoop `Configuration` is not java-serializable; this wrapper
    * ships it into executor-side readers via its own write/readFields
    * (the same shape as Spark's internal SerializableConfiguration,
    * which is `private[spark]`). */
  class SerializableConf(@transient var value: Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false)
      value.readFields(in)
    }
  }
}
