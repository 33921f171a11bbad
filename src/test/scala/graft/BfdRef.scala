package graft

/** Reference best-fit-decreasing packer shared by the l40 replay specs
  * (LlmOpsSpec and QueryHardeningSpec): the exact semantics
  * `LlmQueries.bfdPack` promises — (n DESC, doc_id) placement order,
  * fullest open bin that fits, lowest-bid tie-break at equal loads, a new
  * creation-order bin otherwise. ONE definition so a semantics change
  * cannot silently diverge between the packer's replays (r11 review). */
object BfdRef {
  def pack(rows: Seq[(Long, Long, Long)],
      cap: Long): Seq[(Long, Long, Long, Long, Long)] =
    rows.groupBy(_._2).toSeq.flatMap { case (shard, xs) =>
      var bins = Vector.empty[Long]
      xs.sortBy { case (id, _, n) => (-n, id) }.map { case (id, _, n) =>
        // same precondition as bfdPack: n = 0 would make "exactly full"
        // ambiguous between the two implementations
        require(n > 0, s"BfdRef needs positive sizes; got n=$n for doc $id")
        val cand = bins.zipWithIndex.filter { case (ld, _) => ld + n <= cap }
        if (cand.isEmpty) {
          val bid = bins.size.toLong
          bins = bins :+ n
          (id, shard, n, bid, 0L)
        } else {
          val (ld, bid) = cand.maxBy { case (l, b) => (l, -b) }
          bins = bins.updated(bid, ld + n)
          (id, shard, n, bid.toLong, ld)
        }
      }
    }.sortBy(_._1)
}
