package graft.sources

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Concurrent connection registry (reference S15: fabrix-dyn-conn/src/
  * dc.rs:17-108 `DynConn<K,V>`, a DashMap of live executors keyed by id;
  * sql.rs/mongo.rs specialize V). A service-layer concern, not an engine
  * concern: handles here are driver-side objects (JdbcExecutor,
  * DocumentStore, …) — executors/tasks never see this map.
  */
final class DynConn[K, V] {
  private val m = new ConcurrentHashMap[K, V]()

  /** add_conn: register, failing if the key is taken (dc.rs add semantics). */
  def add(key: K, conn: V): Unit = {
    val prev = m.putIfAbsent(key, conn)
    if (prev != null) throw new IllegalStateException(s"connection $key already registered")
  }

  /** Insert-or-replace (dc.rs update). Returns the previous value if any. */
  def update(key: K, conn: V): Option[V] = Option(m.put(key, conn))

  def get(key: K): Option[V] = Option(m.get(key))

  def require(key: K): V =
    get(key).getOrElse(throw new NoSuchElementException(s"no connection $key"))

  def remove(key: K): Option[V] = Option(m.remove(key))

  def contains(key: K): Boolean = m.containsKey(key)

  /** list_conn: snapshot of registered keys. */
  def keys: Seq[K] = m.keySet().asScala.toSeq

  def size: Int = m.size()

  /** info: snapshot of (key, value) pairs (dc.rs show_info). */
  def entries: Seq[(K, V)] = m.entrySet().asScala.map(e => (e.getKey, e.getValue)).toSeq
}

object DynConn {
  /** The reference keys executors by UUID string — same default here. */
  def newKey(): String = java.util.UUID.randomUUID().toString

  /** SQL-executor registry (fabrix-dyn-conn/src/sql.rs specialization). */
  def sql(): DynConn[String, JdbcExecutor] = new DynConn[String, JdbcExecutor]
  /** Document-store registry (fabrix-dyn-conn/src/mongo.rs specialization). */
  def documents(): DynConn[String, DocumentStore] = new DynConn[String, DocumentStore]
}
