package graft.proj

import org.scalatest.funsuite.AnyFunSuite
import graft.proj.grids.GridCache

/** The process-wide grid cache must stay within its byte budget by evicting
  * least-recently-used entries — the unbounded-growth guard for long-lived
  * executors serving many regional grids. */
class GridCacheSpec extends AnyFunSuite {

  test("byte budget evicts least-recently-used entries") {
    val prev = sys.props.get("graft.grid.cache.bytes")
    try {
      GridCache.clearForTest()
      sys.props("graft.grid.cache.bytes") = "1000"
      GridCache.put("a", "grid-a", 400L)
      GridCache.put("b", "grid-b", 400L)
      assert(GridCache.entryCount == 2 && GridCache.currentBytes == 800L)
      // touch a so b becomes the eviction victim
      assert(GridCache.get[String]("a").contains("grid-a"))
      GridCache.put("c", "grid-c", 400L)
      assert(GridCache.get[String]("b").isEmpty, "LRU entry should be evicted")
      assert(GridCache.get[String]("a").contains("grid-a"))
      assert(GridCache.get[String]("c").contains("grid-c"))
      assert(GridCache.currentBytes <= 1000L)
      // an over-budget single entry still caches (never evict the newcomer)
      GridCache.put("huge", "grid-huge", 5000L)
      assert(GridCache.get[String]("huge").contains("grid-huge"))
      assert(GridCache.entryCount == 1)
    } finally {
      prev match {
        case Some(v) => sys.props("graft.grid.cache.bytes") = v
        case None => sys.props.remove("graft.grid.cache.bytes")
      }
      GridCache.clearForTest()
    }
  }

  test("first writer wins on a racing insert") {
    GridCache.clearForTest()
    GridCache.put("k", "first", 10L)
    assert(GridCache.put("k", "second", 10L) == "first")
    GridCache.clearForTest()
  }
}
