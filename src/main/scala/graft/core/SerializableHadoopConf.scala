package graft.core

import org.apache.hadoop.conf.Configuration

/** Hadoop [[Configuration]] is not `java.io.Serializable`; this wrapper
  * ships one into task closures via Hadoop's own Writable encoding (the
  * same trick Spark uses internally). Mutable-after-deserialize is fine:
  * tasks only read it.
  */
class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
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
