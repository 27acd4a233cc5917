package graft.operators

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], maxIter: Int = 20): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("src", "dst"), maxIter)
      .as[(Long, Long)].collect().toMap

  test("chain + separate pair resolve to their minimum ids") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("local-minimum trap: min must flow through a larger intermediate") {
    // 2's only neighbour is 5 (> 2): naive parent-pointer forests root a
    // spurious component at 2; label propagation must still pull 1 across
    val got = cc(Seq((2L, 5L), (5L, 1L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 1L))
  }

  test("star graph converges in one round of propagation") {
    val got = cc(Seq((10L, 11L), (10L, 12L), (10L, 13L), (10L, 9L)))
    assert(got.values.toSet == Set(9L))
    assert(got.keySet == Set(9L, 10L, 11L, 12L, 13L))
  }

  test("64-node chain converges within O(log n) iterations (pointer jumping)") {
    val edges = (1L until 64L).map(i => (i, i + 1))
    // plain min-propagation would need ~63 rounds; the fused pointer jump
    // must finish well inside 10
    val got = cc(edges, maxIter = 10)
    assert(got.size == 64 && got.values.forall(_ == 1L))
  }

  test("duplicate and reversed edges do not disturb the result") {
    val got = cc(Seq((3L, 7L), (7L, 3L), (3L, 7L), (7L, 12L)))
    assert(got == Map(3L -> 3L, 7L -> 3L, 12L -> 3L))
  }

  // --- large-star / small-star variant ---

  private def ccStars(edges: Seq[(Long, Long)], maxIter: Int = 30): Map[Long, Long] =
    Components.connectedComponentsStars(edges.toDF("src", "dst"), maxIter)
      .as[(Long, Long)].collect().toMap

  test("stars: chain, pair, hub, local-minimum trap") {
    assert(ccStars(Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    assert(ccStars(Seq((2L, 5L), (5L, 1L))) == Map(1L -> 1L, 2L -> 1L, 5L -> 1L))
    val hub = ccStars(Seq((10L, 11L), (10L, 12L), (10L, 13L), (10L, 9L)))
    assert(hub.values.toSet == Set(9L) && hub.keySet == Set(9L, 10L, 11L, 12L, 13L))
  }

  test("stars: self-loop-only nodes keep the connectedComponents node contract") {
    // node 9's only edge is (9,9): both algorithms must return it as its
    // own component — stars' u =!= v normalization used to drop it
    val edges = Seq((1L, 2L), (9L, 9L), (2L, 9L), (7L, 7L))
    val viaStars = ccStars(edges)
    val viaLabels = cc(edges)
    assert(viaStars == Map(1L -> 1L, 2L -> 1L, 9L -> 1L, 7L -> 7L))
    assert(viaStars == viaLabels,
      s"output contracts diverged: stars $viaStars vs labels $viaLabels")
  }

  test("stars: 64-node chain converges within the round budget") {
    val edges = (1L until 64L).map(i => (i, i + 1))
    val got = ccStars(edges, maxIter = 15)
    assert(got.size == 64 && got.values.forall(_ == 1L))
  }

  test("stars and label propagation agree on random graphs") {
    // deterministic LCG so the graphs are reproducible; sparse enough to
    // have many components, dense enough for hubs and transitive chains
    var s = 42L
    def nxt(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    for (trial <- 1 to 3) {
      val n = 60 + trial * 20
      val edges = (1 to (n * 3 / 2)).map { _ =>
        val a = math.floorMod(nxt(), n.toLong)
        val b = math.floorMod(nxt(), n.toLong)
        (a, b)
      }.filter { case (a, b) => a != b }
      val viaStars = ccStars(edges)
      val viaLabels = cc(edges)
      assert(viaStars == viaLabels, s"trial $trial diverged")
    }
  }

  test("componentStats: clique density 1, chain density 2/n, singleton NULL") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), // triangle -> density 1.0
      (10L, 11L), (11L, 12L) // chain of 3 -> density 2/3
    ).toDF("src", "dst")
    val labels = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 10L), (11L, 10L), (12L, 10L),
      (20L, 20L) // singleton (no edges)
    ).toDF("id", "component")
    val out = Components.componentStats(labels, edges)
      .orderBy("component")
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(out.toSeq == Seq(
      (1L, 3L, 3L, Some(1.0)),
      (10L, 3L, 2L, Some(2.0 / 3.0)),
      (20L, 1L, 0L, None)))
  }

  // --- incrementalCc ---

  test("incrementalCc equals from-scratch CC over old+new edges (random graphs)") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val oldEdges = Seq.tabulate(15) { _ =>
        (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong)
      }.filter { case (a, b) => a != b }.distinct
      val newEdges = Seq.tabulate(10) { _ =>
        // overlaps old nodes AND introduces brand-new ones (20-29)
        (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)
      }.filter { case (a, b) => a != b }.distinct
      // standing labeling: CC over old edges + every old-corpus node
      // not in any edge as its own singleton
      val baseNodes = (0L until 20L)
      val ccOld = cc(oldEdges)
      val labels = baseNodes.map(n => (n, ccOld.getOrElse(n, n))).toDF("id", "component")
      val got = Components.incrementalCc(labels, newEdges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      // expectation: full recompute over the union graph, plus old
      // singletons untouched by any edge
      val ccFull = cc(oldEdges ++ newEdges)
      val expected = ccFull ++
        baseNodes.filterNot(ccFull.contains).map(n => n -> n).toMap
      assert(got == expected, s"trial $trial diverged: $got vs $expected")
    }
  }

  test("incrementalCc: a new edge bridging two old components lowers, never raises, labels") {
    val labels = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L)).toDF("id", "component")
    val got = Components.incrementalCc(labels, Seq((2L, 11L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L))
  }

  // --- pageRank ---

  private def pr(edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Long] =
    Components.pageRank(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  /** Reference integer PageRank — same ppb/floor/17-20 arithmetic as the
    * operator, computed sequentially, so equality is exact. */
  private def prReference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val nbrs = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = nbrs.size
    val teleport = 150000000L / n
    var scores = nbrs.keys.map(_ -> 1000000000L / n).toMap
    for (_ <- 1 to iters) {
      scores = nbrs.map { case (id, ns) =>
        val s = ns.map(nb => scores(nb) / nbrs(nb).size).sum
        id -> (teleport + (17L * s) / 20L)
      }
    }
    scores
  }

  test("pageRank: on a cycle every node is a fixed point of the exact arithmetic") {
    // deg = 2 everywhere and 1e9/4 is even, so each round reproduces the
    // uniform score exactly: teleport + 17/20 of the full return flow
    val got = pr(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)))
    assert(got.values.toSet.size == 1, s"cycle symmetry broken: $got")
    assert(got(0L) == 250000000L, s"uniform fixed point drifted: ${got(0L)}")
  }

  test("pageRank: chain interiors outscore endpoints (canonical-pick order)") {
    val got = pr(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got(1L) == got(5L) && got(2L) == got(4L), s"mirror symmetry broken: $got")
    assert(got(3L) > got(1L), s"interior must outscore endpoint: $got")
  }

  test("pageRank: exactly matches the sequential integer reference on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.tabulate(40) { _ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong)
    }.filter { case (a, b) => a != b }.distinct
    assert(pr(edges) == prReference(edges, 5))
  }

  test("reliable checkpointDir: identical results, durable generations actually written") {
    // a 64-node chain runs well past CheckpointInterval rounds in BOTH
    // CC variants, so at least one round lands as a reliable checkpoint;
    // results must be bit-identical to the persist-only path and the
    // checkpoint dir must hold real files (the lost-executor replay cap
    // is only as good as the data actually on durable storage)
    val chain = (1L to 63L).map(i => (i, i + 1))
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    def files(): Long = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .count(p => java.nio.file.Files.isRegularFile(p)).toLong
    }
    val ccCk = Components.connectedComponents(
      chain.toDF("src", "dst"), checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(ccCk == cc(chain), "checkpointed CC diverged from persist-only CC")
    val afterCc = files()
    assert(afterCc > 0, "no checkpoint files written by connectedComponents")
    val starsCk = Components.connectedComponentsStars(
      chain.toDF("src", "dst"), checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(starsCk == ccStars(chain), "checkpointed stars CC diverged")
    assert(files() > afterCc, "no checkpoint files written by stars CC")
    val rnd = new scala.util.Random(11)
    val edges = Seq.tabulate(40) { _ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong)
    }.filter { case (a, b) => a != b }.distinct
    val before = files()
    val prCk = Components.pageRank(
      edges.toDF("src", "dst"), iterations = 5, checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(prCk == prReference(edges, 5), "checkpointed pageRank diverged")
    assert(files() > before, "no checkpoint files written by pageRank")
  }

  test("superseded checkpoint generations are deleted; only the live one survives") {
    // 10 pageRank iterations hit the cadence twice (rounds 4 and 8,
    // 1-based): when the second generation materializes, the first's
    // files root no live lineage and must be deleted on the spot —
    // durable storage holds ONE generation after the call, not
    // O(rounds / interval) accreting for the life of the session
    val rnd = new scala.util.Random(13)
    val edges = Seq.tabulate(40) { _ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong)
    }.filter { case (a, b) => a != b }.distinct
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-gc").toString
    def rddGenerations(): Seq[String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("rdd-"))
        .map(_.toString).toSeq
    }
    val pr = Components.pageRank(
      edges.toDF("src", "dst"), iterations = 10, checkpointDir = Some(dir))
      .as[(Long, Long)].collect()
    assert(pr.nonEmpty)
    val gens = rddGenerations()
    assert(gens.size == 1,
      s"expected exactly the live generation on durable storage, got: $gens")
  }
}
