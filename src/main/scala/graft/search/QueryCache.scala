package graft.search

import java.util.{LinkedHashMap => JLinkedHashMap, Map => JMap}

/** Exact + semantic query result cache (SURVEY §2 D15/D16).
  *
  * Driver-side by design (the reference caches whole result vectors in
  * process memory, vector_store.cpp:26, :281-300, :559-564): an LRU of 100
  * canonicalized queries, plus a linear semantic probe over the cached
  * query embeddings with a cosine threshold (default 0.95). Must be
  * bypassable for benchmarking (D19) — pass `enabled = false`.
  */
final class QueryCache[R](capacity: Int = 100, semanticThreshold: Double = 0.95,
                          enabled: Boolean = true) {

  private final case class Entry(embedding: Array[Float], result: R)

  private val lru = new JLinkedHashMap[String, Entry](16, 0.75f, true) {
    override def removeEldestEntry(e: JMap.Entry[String, Entry]): Boolean =
      size() > capacity
  }

  /** Canonical form: trim + lowercase (vector_store.cpp:281-283). */
  def canonical(query: String): String = query.trim.toLowerCase

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    if (a == null || b == null || a.length == 0 || a.length != b.length) return 0.0
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** L1: exact canonical-query hit. */
  def getExact(query: String): Option[R] = synchronized {
    if (!enabled) None else Option(lru.get(canonical(query))).map(_.result)
  }

  /** L2: semantic hit — first cached entry with cosine > threshold
    * (insertion/access order scan, vector_store.cpp:292-300). */
  def getSemantic(queryEmbedding: Array[Float]): Option[R] = synchronized {
    if (!enabled) return None
    val it = lru.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (cosine(e.getValue.embedding, queryEmbedding) > semanticThreshold)
        return Some(e.getValue.result)
    }
    None
  }

  def put(query: String, embedding: Array[Float], result: R): Unit = synchronized {
    if (enabled) lru.put(canonical(query), Entry(embedding, result))
  }

  def size: Int = synchronized(lru.size())
}
