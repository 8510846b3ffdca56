package graft

import org.apache.spark.sql.functions._

import graft.llm.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: symmetric cycle converges to equal ranks; star center " +
      "dominates; ranks are deterministic under repartitioning") {
    // 3-cycle with reciprocal edges: perfect symmetry → identical ranks
    val cyc = Seq("a" -> "b", "b" -> "c", "c" -> "a",
      "b" -> "a", "c" -> "b", "a" -> "c").toDF("src", "dst")
    val r = Graph.pageRank(cyc, "src", "dst", iters = 8)
      .as[(String, Long)].collect().toMap
    assert(r.values.toSet.size == 1, s"symmetric ranks differ: $r")

    // star: leaves point at the hub and back — the hub must outrank
    // every leaf, and all leaves tie
    val star = Seq("l1" -> "hub", "l2" -> "hub", "l3" -> "hub",
      "hub" -> "l1", "hub" -> "l2", "hub" -> "l3").toDF("src", "dst")
    for (parts <- Seq(1, 7)) {
      val s = Graph.pageRank(star.repartition(parts), "src", "dst",
        iters = 8).as[(String, Long)].collect().toMap
      assert(s("hub") > s("l1"), s"hub must dominate: $s")
      assert(s("l1") == s("l2") && s("l2") == s("l3"),
        s"leaves must tie: $s")
      // partitioning must not change a single unit — integer arithmetic
      // has no order dependence
      val s1 = Graph.pageRank(star.repartition(1), "src", "dst", iters = 8)
        .as[(String, Long)].collect().toMap
      assert(s == s1, "ranks depend on partitioning")
    }
  }

  test("pageRank: duplicate edges collapse; dangling sink keeps only " +
      "the base term's mass flowing back out") {
    // duplicated edge must not double the contribution
    val dup = Seq("a" -> "b", "a" -> "b", "b" -> "a").toDF("src", "dst")
    val single = Seq("a" -> "b", "b" -> "a").toDF("src", "dst")
    val rd = Graph.pageRank(dup, "src", "dst", iters = 4)
      .as[(String, Long)].collect().toMap
    val rs = Graph.pageRank(single, "src", "dst", iters = 4)
      .as[(String, Long)].collect().toMap
    assert(rd == rs, s"multi-edge changed ranks: $rd vs $rs")

    // a → sink with no out-edge: sink's absorbed mass is NOT
    // redistributed (documented variant) — a ends at the bare base
    // rank, the sink above it
    val dang = Seq("a" -> "sink").toDF("src", "dst")
    val rg = Graph.pageRank(dang, "src", "dst", iters = 8)
      .as[(String, Long)].collect().toMap
    assert(rg("sink") > rg("a"), s"$rg")
  }

  test("pageRank: checkpointed deep run matches the lazy plan exactly; " +
      "loud contract failures") {
    val e = Seq("a" -> "b", "b" -> "c", "c" -> "a").toDF("src", "dst")
    val lazyR = Graph.pageRank(e, "src", "dst", iters = 12,
      checkpointInterval = 0).as[(String, Long)].collect().toMap
    val ckR = Graph.pageRank(e, "src", "dst", iters = 12,
      checkpointInterval = 5).as[(String, Long)].collect().toMap
    assert(lazyR == ckR, "checkpointing changed values")
    intercept[IllegalArgumentException] {
      Graph.pageRank(e, "src", "dst", iters = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(e, "src", "dst", iters = 5, dampingPct = 100)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(e.filter(lit(false)), "src", "dst")
    }
  }

  test("pageRank: dampingPct=99 star graph stays inside 64-bit — the " +
      "9e16 scale bound holds where 1e17 would have wrapped") {
    // 15 leaves all pointing at one hub concentrate nearly the whole
    // mass on a single node; under the old scale = 1e17 DIV |V| the
    // damping product 99·s wrapped negative for this shape (s ≈
    // 1e17·15/16 ⇒ 99·s ≈ 9.3e18 > 2^63−1) — with 9e16 the worst case
    // is 8.91e18 and every rank stays a genuine non-negative mass
    val star = (1 to 15).map(i => (s"l$i", "hub")).toDF("src", "dst")
    val r = Graph.pageRank(star, "src", "dst", iters = 6, dampingPct = 99)
      .as[(String, Long)].collect().toMap
    assert(r.values.forall(_ >= 0), s"wrapped rank: $r")
    val n = r.size
    val scale = math.max(10000L, 90000000000000000L / n)
    assert(r.values.map(BigInt(_)).sum <= BigInt(scale) * n,
      s"mass invariant violated: $r")
    assert(r("hub") > r("l1"), s"hub must dominate: $r")
  }

  test("pageRank warm start: warm(cold(j), k) ≡ cold(j+k); a converged " +
      "state is a fixed point; grown graphs clamp mass and stay ordered") {
    val e = Seq("a" -> "b", "b" -> "c", "c" -> "a",
      "b" -> "a", "c" -> "b", "a" -> "c").toDF("src", "dst")
    // continuation: 4 cold iterations then 3 warm ≡ 7 cold
    val cold4 = Graph.pageRank(e, "src", "dst", iters = 4)
    val warm7 = Graph.pageRank(e, "src", "dst", iters = 3, ranks0 = cold4)
      .as[(String, Long)].collect().toMap
    val cold7 = Graph.pageRank(e, "src", "dst", iters = 7)
      .as[(String, Long)].collect().toMap
    assert(warm7 == cold7, s"$warm7 vs $cold7")
    // fixed point: the integer update converges exactly on this graph
    val c40 = Graph.pageRank(e, "src", "dst", iters = 40)
    val c41 = Graph.pageRank(e, "src", "dst", iters = 41)
      .as[(String, Long)].collect().toMap
    val m40 = c40.as[(String, Long)].collect().toMap
    assert(m40 == c41, "40 iterations did not reach the integer fixed point")
    val warmFix = Graph.pageRank(e, "src", "dst", iters = 1, ranks0 = c40)
      .as[(String, Long)].collect().toMap
    assert(warmFix == m40, s"converged state is not a fixed point: $warmFix")

    // grown graph: scale halves (3 → 6 nodes), so converged old mass +
    // new-node seeds exceed |V|·scale → the DECIMAL clamp must fire,
    // keep everything non-negative, and preserve the warm ordering
    val grown = e.union(Seq("d" -> "e", "e" -> "f", "f" -> "d",
      "a" -> "d").toDF("src", "dst"))
    val warmGrown = Graph.pageRank(grown, "src", "dst", iters = 2,
      ranks0 = c40).as[(String, Long)].collect().toMap
    assert(warmGrown.size == 6 && warmGrown.values.forall(_ >= 0),
      s"grown warm start broke: $warmGrown")
    val scale6 = 90000000000000000L / 6
    assert(warmGrown.values.map(BigInt(_)).sum <= BigInt(scale6) * 6,
      s"mass invariant violated after clamp: $warmGrown")

    // corrupt warm input is refused loudly
    intercept[IllegalArgumentException] {
      Graph.pageRank(e, "src", "dst", iters = 1,
        ranks0 = Seq(("a", -5L)).toDF("node", "rank_scaled"))
    }
  }

  test("labelPropagation warm start: warm(cold(j), k) ≡ cold(j+k); " +
      "seeds stay pinned over conflicting warm labels") {
    // chain s → m1 → m2 → m3: the seed label takes one extra hop per
    // round, so intermediate states genuinely differ per iteration
    val e = Seq("s" -> "m1", "m1" -> "m2", "m2" -> "m3").toDF("src", "dst")
    val seeds = Seq(("s", "X")).toDF("node", "label")
    val cold1 = Graph.labelPropagation(e, seeds, iters = 1)
    val warm3 = Graph.labelPropagation(e, seeds, iters = 2, labels0 = cold1)
      .as[(String, Option[String])].collect().toMap
    val cold3 = Graph.labelPropagation(e, seeds, iters = 3)
      .as[(String, Option[String])].collect().toMap
    assert(warm3 == cold3, s"$warm3 vs $cold3")
    // converged labeling is a fixed point
    val c4 = Graph.labelPropagation(e, seeds, iters = 4)
    val warmFix = Graph.labelPropagation(e, seeds, iters = 1, labels0 = c4)
      .as[(String, Option[String])].collect().toMap
    assert(warmFix == c4.as[(String, Option[String])].collect().toMap)
    // a warm label on a seed node never displaces the pinned seed
    val lying = Seq(("s", "WRONG"), ("m1", "X")).toDF("node", "label")
    val pinned = Graph.labelPropagation(e, seeds, iters = 1, labels0 = lying)
      .as[(String, Option[String])].collect().toMap
    assert(pinned("s").contains("X"), s"seed displaced: $pinned")
  }

  test("labelPropagation: majority wins, ties take the smallest label, " +
      "seeds stay pinned, unreachable nodes stay NULL") {
    // votes into t: two X (a1, a2), one Y (b) → X; votes into u: one X,
    // one Y → tie → X (lexicographically smaller); seed s keeps Z even
    // though its only in-neighbor says X; island never labeled
    val edges = Seq(
      "a1" -> "t", "a2" -> "t", "b" -> "t",
      "a1" -> "u", "b" -> "u",
      "a1" -> "s",
      "i1" -> "island").toDF("src", "dst")
    val seeds = Seq("a1" -> "X", "a2" -> "X", "b" -> "Y", "s" -> "Z")
      .toDF("node", "label")
    val r = Graph.labelPropagation(edges, seeds, iters = 3)
      .as[(String, Option[String])].collect().toMap
    assert(r("t").contains("X"), s"majority: $r")
    assert(r("u").contains("X"), s"tie-break: $r")
    assert(r("s").contains("Z"), s"seed pin: $r")
    assert(r("island").isEmpty && r("i1").isEmpty, s"unreachable: $r")
  }

  test("labelPropagation: multi-hop spread, partitioning determinism, " +
      "checkpoint parity, loud failures") {
    val chain = Seq("a" -> "b", "b" -> "c", "c" -> "d").toDF("src", "dst")
    val seeds = Seq("a" -> "X").toDF("node", "label")
    // 1 iter reaches b only; 3 iters reach d
    val r1 = Graph.labelPropagation(chain, seeds, iters = 1)
      .as[(String, Option[String])].collect().toMap
    assert(r1("b").contains("X") && r1("c").isEmpty)
    val r3 = Graph.labelPropagation(chain, seeds, iters = 3)
      .as[(String, Option[String])].collect().toMap
    assert(r3("d").contains("X"), s"$r3")
    val rp = Graph.labelPropagation(chain.repartition(7), seeds, iters = 3)
      .as[(String, Option[String])].collect().toMap
    assert(rp == r3, "partitioning changed labels")
    val rc = Graph.labelPropagation(chain, seeds, iters = 3,
      checkpointInterval = 1).as[(String, Option[String])].collect().toMap
    assert(rc == r3, "checkpointing changed labels")
    intercept[IllegalArgumentException] {
      Graph.labelPropagation(chain, seeds, iters = 0)
    }
  }
}
