package graft.sketch

/** Local union-find (path halving + union by min-id). Used by tests as the
  * exact oracle for connected components, and inside partition-local
  * pre-clustering. The dataset-scale variant is the hybrid driver/distributed
  * connected-components in `graft.pipeline.Dedup.clusters`
  * (replacing the reference's O(N²) all-vs-all loop,
  * `/root/reference/examples/main.cpp:98-106`).
  */
final class UnionFind {
  private val parent = new java.util.HashMap[Long, Long]()

  def find(x0: Long): Long = {
    var x = x0
    if (!parent.containsKey(x)) { parent.put(x, x); return x }
    while (parent.get(x) != x) {
      val p = parent.get(x)
      parent.put(x, parent.get(p))
      x = parent.get(x)
    }
    x
  }

  def union(a: Long, b: Long): Unit = {
    val ra = find(a)
    val rb = find(b)
    if (ra != rb) {
      // union by min id → cluster id = min member id, deterministic
      if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
    }
  }

  /** (member → min-id-of-component) for every seen vertex. */
  def components(): Map[Long, Long] = {
    val out = Map.newBuilder[Long, Long]
    val it = parent.keySet().iterator()
    while (it.hasNext) { val k = it.next(); out += (k -> find(k)) }
    out.result()
  }
}
