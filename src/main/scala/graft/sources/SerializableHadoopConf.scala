package graft.sources

import org.apache.hadoop.conf.Configuration

/** Serializable carrier for shipping the driver's Hadoop configuration
  * into tasks — the pattern of Spark's own SerializableConfiguration,
  * re-expressed here because that class is `private[spark]`. Java
  * serialization delegates to the conf's write/readFields, so each task
  * deserialization rebuilds the Configuration ONCE (and without
  * re-parsing default resources), instead of the former per-partition
  * loop over a broadcast property map. Shared by the distributed CSV
  * melt (VoteMatrix.meltAll) and the task-side export writer
  * (Export.writeAllDistributed) so the shipping discipline cannot
  * drift between them.
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
