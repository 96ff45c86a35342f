package graft.proj.grids

/** Process-wide byte-bounded LRU for decoded shift grids.
  *
  * At 100 TB scale a long-lived executor JVM can be asked for many regional
  * grids over its lifetime; the previous per-type maps grew monotonically.
  * Grid lookups happen at operation-SETUP time only (compiled kernels hold
  * direct references to their grids), so a synchronized access-ordered map
  * costs nothing on the per-row path. Eviction frees the cache slot only:
  * any live operation keeps its grid reachable until the operation itself
  * is collected.
  *
  * Budget: `graft.grid.cache.bytes` system property (read per eviction so
  * tests and operators can tune a running JVM), default 1 GiB. The charge
  * for an entry is the encoded file size — the decoded lattice is the same
  * order of magnitude.
  */
object GridCache {

  private def maxBytes: Long =
    sys.props.get("graft.grid.cache.bytes").flatMap(_.toLongOption)
      .getOrElse(1L << 30)

  private final case class Entry(value: AnyRef, bytes: Long)

  // accessOrder = true: iteration order is least-recently-used first
  private val map = new java.util.LinkedHashMap[String, Entry](64, 0.75f, true)
  private var total = 0L

  def get[G](key: String): Option[G] = synchronized {
    Option(map.get(key)).map(_.value.asInstanceOf[G])
  }

  /** insert (first writer wins) and return the cached value. */
  def put[G](key: String, value: G, bytes: Long): G = synchronized {
    val prev = map.get(key)
    if (prev != null) prev.value.asInstanceOf[G]
    else {
      map.put(key, Entry(value.asInstanceOf[AnyRef], bytes))
      total += bytes
      val budget = maxBytes
      val it = map.entrySet().iterator()
      while (total > budget && map.size > 1 && it.hasNext) {
        val eldest = it.next()
        if (eldest.getKey != key) {
          total -= eldest.getValue.bytes
          it.remove()
        }
      }
      value
    }
  }

  def entryCount: Int = synchronized(map.size)
  def currentBytes: Long = synchronized(total)
  private[graft] def clearForTest(): Unit = synchronized { map.clear(); total = 0 }
}
