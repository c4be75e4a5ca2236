package graft.sources.lwes

import org.apache.hadoop.conf.Configuration
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/** Java-serializable Hadoop `Configuration` carrier.
  *
  * The driver's session conf (`spark.hadoop.*` — object-store
  * credentials, endpoints, custom filesystems) must reach executor-side
  * readers/writers; `Configuration` itself is not serializable, and
  * building `new Configuration()` on the executor silently drops every
  * session setting. Broadcast once per scan/write (the conf is ~100 KB;
  * shipping it inside every task's serialized factory would multiply
  * that by the task count).
  */
class SerializableHadoopConf(@transient var value: Configuration)
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

object SerializableHadoopConf {
  /** Driver-side: wrap + broadcast the active session's Hadoop conf. */
  def broadcast(conf: Configuration): Broadcast[SerializableHadoopConf] =
    SparkSession.active.sparkContext.broadcast(new SerializableHadoopConf(conf))
}
