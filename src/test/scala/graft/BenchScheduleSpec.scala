package graft

import org.scalatest.funsuite.AnyFunSuite

/** The sharedInput bench-scheduling contract (Bench.groupSchedule):
  * declared siblings run adjacently against one warmed cache; the
  * cache is released exactly when the group ends; each group's cache
  * FILL is attributed to its first scheduled member (the artifact's
  * shared_fill map); everything else keeps the per-entry isolation.
  * Pure-function tests — no session. */
class BenchScheduleSpec extends AnyFunSuite {

  private val g = Map("x4_jaccard_neardup" -> "doc_token_hash_sets",
    "x14_containment" -> "doc_token_hash_sets")

  test("siblings are adjacent and only the non-last member keeps cache") {
    // name order alone would interleave x1/x2/x4e between the siblings
    val names = Seq("x4_jaccard_neardup", "x1_exact_dedup",
      "x14_containment", "x4e_jaccard_sparse", "q01_scan_project")
    val (ordered, keep, fill) = Bench.groupSchedule(names, g)
    val i14 = ordered.indexOf("x14_containment")
    val i4 = ordered.indexOf("x4_jaccard_neardup")
    assert(math.abs(i14 - i4) == 1, s"siblings not adjacent: $ordered")
    // x14 sorts before x4 within the group: it pays the fill and keeps
    // the cache; x4 is the group's last member and clears
    assert(keep("x14_containment") && !keep("x4_jaccard_neardup"))
    assert(!keep("x1_exact_dedup") && !keep("x4e_jaccard_sparse") &&
      !keep("q01_scan_project"))
    assert(fill == Map("doc_token_hash_sets" -> "x14_containment"))
  }

  test("a group filtered down to one member never keeps cache but still pays the fill") {
    val (_, keep, fill) = Bench.groupSchedule(
      Seq("x14_containment", "x1_exact_dedup"), g)
    assert(!keep("x14_containment"))
    assert(fill == Map("doc_token_hash_sets" -> "x14_containment"))
  }

  test("two groups never leak cache into each other") {
    val g2 = g ++ Map("a2" -> "grp_a", "a1" -> "grp_a")
    val names = Seq("x4_jaccard_neardup", "a1", "x14_containment", "a2")
    val (ordered, keep, fill) = Bench.groupSchedule(names, g2)
    // groups are contiguous blocks (ordered by group token:
    // "doc_token_hash_sets" < "grp_a"); each group's last member clears
    assert(ordered == Seq("x14_containment", "x4_jaccard_neardup",
      "a1", "a2"))
    assert(keep("a1") && !keep("a2"))
    assert(keep("x14_containment") && !keep("x4_jaccard_neardup"))
    assert(fill == Map("doc_token_hash_sets" -> "x14_containment",
      "grp_a" -> "a1"))
  }

  test("no groups means name order and no cache carrying") {
    val names = Seq("b", "a", "c")
    val (ordered, keep, fill) = Bench.groupSchedule(names, Map.empty)
    assert(ordered == Seq("a", "b", "c"))
    assert(keep.values.forall(_ == false))
    assert(fill.isEmpty)
  }

  test("an ungrouped name sorting inside a group token's range cannot split the block") {
    // "doc_x" sorts between the group token "doc_token_hash_sets" and
    // any later name — under a single namespace it would interleave
    // into the group block and silently split the warmed-cache run
    // (re-paying the fill). The g:/n: key prefixes keep the namespaces
    // disjoint: every ungrouped name sorts outside every group block.
    val names = Seq("x4_jaccard_neardup", "doc_x", "x14_containment")
    val (ordered, keep, _) = Bench.groupSchedule(names, g)
    assert(ordered == Seq("x14_containment", "x4_jaccard_neardup",
      "doc_x"), s"group block split: $ordered")
    assert(keep("x14_containment") && !keep("x4_jaccard_neardup"))
  }

  test("the registry's declared groups are the x4 pair + k-means six") {
    val declared = graft.queries.Registry.all
      .flatMap(e => e.sharedInput.map(e.name -> _)).toMap
    // the k-means family: six entries whose KMeans.fit persists the
    // SAME canonicalized quantized-embeddings plan (x19/p5 also build
    // it directly); one warmed fill, five warm replays — the
    // cluster-once-consume-many pipeline shape (r15 verdict task #5)
    val kq = Seq("x17_kmeans_clusters", "x18_cluster_diversity",
      "x19_cluster_nn", "x23_cluster_sample", "x26_cluster_terms",
      "p5_semantic_dedup").map(_ -> "embeddings_kmeans_quantized")
    assert(declared == g ++ kq,
      "sharedInput declarations changed — re-measure the family and " +
        "update this pin + the Bench scaladoc")
  }
}
