package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops._

/** Property-based invariants over the parity operators (SURVEY.md §5.3):
  * algebraic laws checked on ScalaCheck-generated inputs. Uses Gen
  * directly with fixed seeds (the scalatest<->scalacheck bridge artifact
  * isn't in the offline cache) — deterministic across runs, few cases
  * per property since each case costs a Spark round-trip.
  */
class PropSpec extends SparkSpec {

  private val Cases = 8

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  private def cases[A](g: Gen[A])(body: A => Unit): Unit =
    (1 to Cases).foreach(i => body(sample(g, 42L + i)))

  private val schema = StructType(Seq(
    StructField("k", IntegerType),
    StructField("s", StringType),
    StructField("v", DoubleType)))

  private val rowGen: Gen[Row] = for {
    k <- Gen.chooseNum(0, 5)
    s <- Gen.option(Gen.oneOf("alpha", "beta", "gamma", "a-b", ""))
    v <- Gen.option(Gen.chooseNum(-10.0, 10.0))
  } yield Row(Integer.valueOf(k), s.orNull, v.map(java.lang.Double.valueOf).orNull)

  private val rowsGen: Gen[List[Row]] = Gen.choose(0, 12).flatMap(Gen.listOfN(_, rowGen))

  private def df(rows: List[Row]) =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  test("prop: unionAll row count is additive") {
    cases(Gen.zip(rowsGen, rowsGen)) { case (a, b) =>
      assert(Sources.unionAll(Seq(df(a), df(b))).count() === a.size + b.size)
    }
  }

  test("prop: dedup is idempotent and bounded by input size") {
    cases(rowsGen) { rows =>
      val once = Cleaning.dedup(df(rows))
      val n = once.count()
      assert(n <= rows.size)
      assert(Cleaning.dedup(once).count() === n)
    }
  }

  test("prop: fillNulls leaves no nulls; is idempotent") {
    cases(rowsGen) { rows =>
      val filled = Cleaning.fillNulls(df(rows), "X", 0d)
      assert(filled.filter(col("s").isNull || col("v").isNull).count() === 0)
      val again = Cleaning.fillNulls(filled, "Y", 1d)
      assert(again.except(filled).count() === 0)
    }
  }

  test("prop: merge-then-split round-trips delimiter-free values") {
    cases(rowsGen) { rows =>
      // restrict to rows whose s has no '|' and is non-null (split can't
      // distinguish a null field from a missing one)
      val in = df(rows).filter(col("s").isNotNull && !col("s").contains("|"))
      val merged = Columns.mergeColumns(in.withColumn("k2", col("k").cast("string")),
        "m", "|", Seq("s", "k2"))
      val back = Columns.splitColumnLiteral(merged, "m", "|")
      assert(back.filter(col("m_1") =!= col("s") || col("m_2") =!= col("k2")).count() === 0)
    }
  }

  test("prop: join-type row-count containment inner <= left <= outer") {
    cases(Gen.zip(rowsGen, rowsGen)) { case (a, b) =>
      val l = df(a).select(col("k"), col("s"))
      val r = df(b).select(col("k").as("k2"), col("v"))
      val inner = Relational.join(l, r, "k", "k2", "inner").count()
      val left = Relational.join(l, r, "k", "k2", "left").count()
      val outer = Relational.join(l, r, "k", "k2", "outer").count()
      assert(inner <= left && left <= outer)
      assert(left >= l.count()) // left join never drops left rows
    }
  }

  test("prop: replaceValue rewrites all targets, preserves others and count") {
    cases(rowsGen) { rows =>
      val in = df(rows)
      val out = Mutation.replaceValue(in, "s", "alpha", "beta")
      assert(out.filter(col("s") === "alpha").count() === 0)
      assert(out.filter(col("s") === "gamma").count() ===
        in.filter(col("s") === "gamma").count())
      assert(out.count() === in.count())
    }
  }

  test("prop: graft_dot is symmetric and bilinear (scaling)") {
    graft.ext.expr.ArrayDotProduct.ensureRegistered(spark)
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-4.0, 4.0))
    cases(Gen.zip(vecGen, vecGen, Gen.chooseNum(-3.0, 3.0))) { case (a, b, c) =>
      import spark.implicits._
      val row = Seq((a.toArray, b.toArray)).toDF("a", "b")
        .select(
          call_function("graft_dot", col("a"), col("b")).as("ab"),
          call_function("graft_dot", col("b"), col("a")).as("ba"),
          call_function("graft_dot",
            transform(col("a"), x => x * lit(c)), col("b")).as("ca_b"))
        .head()
      assert(row.getDouble(0) === row.getDouble(1))
      assert(math.abs(row.getDouble(2) - c * row.getDouble(0)) < 1e-9)
    }
  }

  test("prop: simhash fingerprints are token-order invariant (vote sums commute)") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.ext.expr.TextKernels
    val tokGen = Gen.listOfN(10, Gen.oneOf("the", "cat", "sat", "alpha", "beta", "x1", "zz"))
    cases(Gen.zip(tokGen, Gen.chooseNum(1L, 999L))) { case (toks, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(toks)
      val a = TextKernels.simhash64(UTF8String.fromString(toks.mkString(" ")))
      val b = TextKernels.simhash64(UTF8String.fromString(shuffled.mkString(" ")))
      assert(a === b)
      val a16 = TextKernels.simhash16(UTF8String.fromString(toks.mkString(" ")))
      val b16 = TextKernels.simhash16(UTF8String.fromString(shuffled.mkString(" ")))
      assert(a16.toString === b16.toString)
    }
  }

  test("prop: word-set hits are bounded by token count and additive over disjoint sets") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.ext.expr.TextKernels
    val tokGen = Gen.listOfN(12, Gen.oneOf("the", "cat", "and", "dog", "un", "el"))
    def sets(ws: Seq[Seq[String]]): Array[java.util.HashSet[String]] =
      ws.map { w =>
        val h = new java.util.HashSet[String](); w.foreach(h.add); h
      }.toArray
    cases(tokGen) { toks =>
      val text = UTF8String.fromString(toks.mkString(" "))
      val disjoint = Seq(Seq("the", "and"), Seq("el", "un"))
      val hits = TextKernels.wordSetHits(text, sets(disjoint)).toLongArray()
      assert(hits.forall(h => h >= 0 && h <= toks.length))
      // counts match a naive reference count
      assert(hits(0) === toks.count(disjoint(0).contains(_)))
      assert(hits(1) === toks.count(disjoint(1).contains(_)))
      // the union set's count is the sum of the disjoint parts
      val union = TextKernels.wordSetHits(text, sets(Seq(disjoint.flatten))).toLongArray()
      assert(union(0) === hits.sum)
    }
  }

  test("prop: pivotCount preserves the per-group row count across pivot columns") {
    cases(rowsGen) { rows =>
      val in = df(rows)
      val vals = Seq("alpha", "beta", "gamma", "a-b", "")
      val p = Reshape.pivotCount(in.filter(col("s").isNotNull), col("k"), "k", "s", vals)
      val pivotTotals = p.collect()
        .map(r => r.getInt(0) -> (1 to vals.length).map(r.getLong).sum).toMap
      val groupTotals = in.filter(col("s").isNotNull).groupBy(col("k")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(pivotTotals === groupTotals)
    }
  }

  // adversarial text: words, runs of spaces (empty tokens!), leading/
  // trailing spaces — the split-edge semantics where kernels diverge
  // from built-ins if anything is off
  private val textGen: Gen[String] = Gen.choose(0, 10).flatMap { n =>
    Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "a", "", " ", "dd"))
      .map(_.mkString(" "))
  }

  test("prop: graft_rep_counts kernel equals the array_distinct formulation on edge-case text") {
    import graft.ext.expr.TextKernels
    cases(Gen.listOfN(6, textGen)) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val viaKernel = graft.ext.Curation.repetitionStats(docs).collect().map(_.toString).toSeq
      val viaArrays = graft.ext.Curation.repetitionStatsExpanded(docs).collect().map(_.toString).toSeq
      assert(viaKernel === viaArrays)
      // and the raw counts agree with a direct reference computation
      texts.foreach { t =>
        val toks = t.split(" ", -1)
        val rc = TextKernels.repCounts(
          org.apache.spark.unsafe.types.UTF8String.fromString(t)).toLongArray()
        assert(rc(0) === toks.length)
        assert(rc(1) === toks.distinct.length)
        assert(rc(2) === toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq.distinct.length)
      }
    }
  }

  test("prop: splitAssign covers every row exactly once with valid buckets") {
    cases(rowsGen) { rows =>
      val in = df(rows).withColumn("key", abs(col("k")).cast("long"))
      val assigned = graft.ext.Curation.splitAssign(in, "key")
      assert(assigned.count() === rows.size)
      assert(assigned.filter(col("bucket") < 0 || col("bucket") > 99).count() === 0)
      assert(assigned.filter(!col("split").isin("train", "valid", "test")).count() === 0)
      // deterministic: same key always lands in the same split
      val perKey = assigned.groupBy(col("key"))
        .agg(countDistinct(col("split")).as("n")).filter(col("n") > 1)
      assert(perKey.count() === 0)
    }
  }

  test("prop: quality-check violation counts equal per-rule filter counts") {
    import spark.implicits._
    val kvGen = Gen.listOfN(40, Gen.zip(
      Gen.option(Gen.chooseNum(-5L, 5L)),
      Gen.option(Gen.chooseNum(-10.0, 110.0))))
    cases(kvGen) { rows =>
      val d = rows.map { case (k, v) =>
        (k.map(Long.box).orNull, v.map(Double.box).orNull)
      }.toDF("k", "v")
      val rules = Seq(ext.Quality.notNull("k"), ext.Quality.inRange("v", 0, 100))
      val got = ext.Quality.check(d, rules, uniqueKeys = Seq(Seq("k")))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val n = d.count()
      assert(got("not_null_k") === ((n, d.filter(col("k").isNull).count())))
      assert(got("range_v") ===
        ((n, d.filter(col("v").isNull || col("v") < 0 || col("v") > 100).count())))
      // uniqueness: n_rows - countDistinct (null keys skipped by countDistinct)
      val nd = d.filter(col("k").isNotNull).select(col("k")).distinct().count()
      assert(got("unique_k") === ((n, n - nd)))
    }
  }

  test("prop: seqPack and capPerGroup are invariant to input partitioning") {
    import spark.implicits._
    val word = Gen.oneOf("a", "b", "c", "d", "e")
    val docGen = for {
      id <- Gen.chooseNum(0L, 500L)
      src <- Gen.oneOf("s1", "s2", "s3")
      n <- Gen.chooseNum(1, 9)
      ws <- Gen.listOfN(n, word)
    } yield (id, src, ws.mkString(" "))
    cases(Gen.listOfN(24, docGen).map(_.distinctBy(_._1))) { rows =>
      val base = rows.toDF("doc_id", "source", "text")
      Seq(base.repartition(1), base.repartition(13, col("text"))).foreach { d =>
        val packs = ext.Curation.seqPack(d, budget = 12L, shardSize = 100L)
          .collect().map(_.toString).sorted.toSeq
        val ref = ext.Curation.seqPack(base, budget = 12L, shardSize = 100L)
          .collect().map(_.toString).sorted.toSeq
        assert(packs === ref) // window order is (source, shard, key), never layout
        val kept = ext.Curation.capPerGroup(d, "source", "doc_id", cap = 4)
          .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
        val keptRef = ext.Curation.capPerGroup(base, "source", "doc_id", cap = 4)
          .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
        assert(kept === keptRef) // hash rank selection, not positional
      }
    }
  }

  test("prop: contentChecksum xor-merges across disjoint shards") {
    import spark.implicits._
    val rowG = Gen.zip(Gen.chooseNum(0L, 10000L), Gen.alphaStr.map(_.take(6)))
    cases(Gen.listOfN(16, rowG).map(_.distinctBy(_._1))) { rows =>
      val (l, r) = rows.splitAt(rows.length / 2)
      def ck(xs: List[(Long, String)]) =
        if (xs.isEmpty) (0L, 0L)
        else {
          val row = ext.Quality.contentChecksum(
            xs.toDF("k", "v"), concat_ws("|", col("k"), col("v"))).head()
          (row.getLong(0), row.getLong(1))
        }
      val (na, da) = ck(l); val (nb, db) = ck(r); val (nAll, dAll) = ck(rows)
      assert(nAll === na + nb)
      assert(dAll === (da ^ db)) // digest(a union b) = digest(a) XOR digest(b)
    }
  }

  test("prop: pageRank is invariant to pair-table partitioning and pair order") {
    import spark.implicits._
    val pairGen = Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(0L, 30L))
      .suchThat { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    cases(Gen.listOfN(20, pairGen).map(_.distinct).suchThat(_.nonEmpty)) { ps =>
      val base = ps.toDF("doc_a", "doc_b")
      val ref = ext.Graph.pageRank(base, "doc_a", "doc_b", iters = 2)
        .collect().map(_.toString).toSeq
      Seq(base.repartition(7), base.orderBy(col("doc_b").desc)).foreach { d =>
        val got = ext.Graph.pageRank(d, "doc_a", "doc_b", iters = 2)
          .collect().map(_.toString).toSeq
        assert(got === ref)
      }
      // rank mass conserved: sum of rank*N over nodes = N (trunc4 loss bounded)
      val n = ref.length
      val total = ext.Graph.pageRank(base, "doc_a", "doc_b", iters = 2)
        .agg(sum(col("rank_x_n"))).head().getDouble(0)
      assert(math.abs(total - n) < n * 2e-4)
    }
  }

  test("prop: passage dedup equals a brute-force aligned chunker") {
    import spark.implicits._
    val word = Gen.oneOf("a", "b", "c", "d")
    val textGen = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    cases(Gen.listOfN(12, textGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = ext.Dedup.passageDedup(docs, size = 3).collect()
      assert(out.forall(r => r.getLong(1) >= 2 && r.getLong(2) >= 0
        && r.getLong(2) < texts.length))
      val brute = texts.zipWithIndex.flatMap { case (t, i) =>
        t.split(' ').grouped(3).filter(_.length == 3).map(c => (c.mkString(" "), i.toLong))
      }
      val multiDoc = brute.groupBy(_._1).filter(_._2.map(_._2).distinct.length >= 2)
      assert(out.length === multiDoc.size)
    }
  }

  test("prop: equalFrequencyBins is layout-invariant and conserves rows into ordered bins") {
    import spark.implicits._
    cases(Gen.listOfN(60, Gen.chooseNum(1L, 25L)).suchThat(_.nonEmpty)) { vs =>
      val base = vs.map(Tuple1(_)).toDF("v")
      val ref = ext.Curation.equalFrequencyBins(base, "v", 5)
        .collect().map(_.toString).toSeq
      Seq(base.repartition(9), base.orderBy(col("v").desc)).foreach { d =>
        val got = ext.Curation.equalFrequencyBins(d, "v", 5)
          .collect().map(_.toString).toSeq
        assert(got === ref)
      }
      val rows = ext.Curation.equalFrequencyBins(base, "v", 5).collect()
      assert(rows.map(_.getAs[Long]("n_rows")).sum === vs.length.toLong)
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("bin") < b.getAs[Long]("bin"))
          assert(a.getAs[Long]("hi") < b.getAs[Long]("lo"))
        case _ =>
      }
    }
  }

  test("prop: triangleStats is invariant to edge order, duplication, and reversal") {
    import spark.implicits._
    // remap instead of suchThat: rejection inside listOfN makes the
    // whole sample fail with these seeds
    val pairGen = Gen.zip(Gen.chooseNum(1L, 15L), Gen.chooseNum(1L, 14L))
      .map { case (a, b0) => (a, if (b0 >= a) b0 + 1 else b0) }
    cases(Gen.listOfN(30, pairGen)) { ps =>
      val base = ps.toDF("a", "b")
      val ref = ext.Graph.triangleStats(base, "a", "b").head().toString
      // reversed edges, duplicated list, shuffled layout: same graph
      val reversed = ps.map(_.swap).toDF("a", "b")
      val doubled = (ps ++ ps).toDF("a", "b").repartition(7)
      Seq(reversed, doubled).foreach { d =>
        assert(ext.Graph.triangleStats(d, "a", "b").head().toString === ref)
      }
      // sanity vs brute force on the canonical edge set
      val edges = ps.map { case (x, y) => (math.min(x, y), math.max(x, y)) }.distinct
      val eset = edges.toSet
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val brute = nodes.combinations(3).count { case Seq(x, y, z) =>
        eset((x, y)) && eset((x, z)) && eset((y, z))
      }
      val row = ext.Graph.triangleStats(base, "a", "b").head()
      assert(row.getAs[Long]("n_triangles") === brute.toLong)
      assert(row.getAs[Long]("n_edges") === edges.length.toLong)
    }
  }

  test("prop: paretoFrontier equals the brute-force dominance filter, layout-invariant") {
    import spark.implicits._
    val rowG = for {
      g <- Gen.oneOf("g1", "g2")
      c <- Gen.chooseNum(0L, 6L)
      v <- Gen.chooseNum(0L, 6L)
    } yield (g, c, v)
    cases(Gen.chooseNum(1, 18).flatMap(Gen.listOfN(_, rowG))) { rows =>
      val base = rows.toDF("grp", "cost", "gain")
      def key(r: Row) = (r.getString(0), r.getLong(1), r.getLong(2))
      val got = ext.Aggregates.paretoFrontier(base, "grp", "cost", "gain")
        .collect().map(key).sorted.toSeq
      // brute force: p survives iff no q in its group dominates it
      val brute = rows.filter { case (g, c, v) =>
        !rows.exists { case (g2, c2, v2) =>
          g2 == g && (c2 <= c && v2 >= v) && (c2 < c || v2 > v)
        }
      }.map { case (g, c, v) => (g, c, v) }.sorted
      assert(got === brute)
      val shuffled = ext.Aggregates.paretoFrontier(
        base.repartition(7).orderBy(col("gain")), "grp", "cost", "gain")
        .collect().map(key).sorted.toSeq
      assert(shuffled === got)
    }
  }

  test("prop: equalFrequencyBinsByGroup matches the global op applied per group") {
    import spark.implicits._
    val rowG = for {
      g <- Gen.oneOf("x", "y", "z")
      v <- Gen.chooseNum(1L, 20L)
    } yield (g, v)
    cases(Gen.chooseNum(2, 40).flatMap(Gen.listOfN(_, rowG))) { rows =>
      val base = rows.toDF("g", "v")
      val got = ext.Curation.equalFrequencyBinsByGroup(base, "v", "g", 4)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).sorted.toSeq
      val expected = rows.map(_._1).distinct.sorted.flatMap { g =>
        val sub = rows.filter(_._1 == g).map(t => Tuple1(t._2)).toDF("v")
        ext.Curation.equalFrequencyBins(sub, "v", 4).collect()
          .map(r => (g, r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4)))
      }.sorted.toSeq
      assert(got === expected)
    }
  }

  test("prop: graft_cov covariance matches the naive local computation across partitionings") {
    import spark.implicits._
    val vecGen: Gen[List[Array[Double]]] =
      Gen.choose(2, 10).flatMap { n =>
        Gen.listOfN(n, Gen.listOfN(4, Gen.chooseNum(-3.0, 3.0)).map(_.toArray))
      }
    cases(vecGen) { vecs =>
      // local reference: population cov = E[xy] - E[x]E[y]
      val n = vecs.length.toDouble
      def mean(d: Int) = vecs.map(_(d)).sum / n
      def cov(i: Int, j: Int) =
        vecs.map(v => v(i) * v(j)).sum / n - mean(i) * mean(j)
      Seq(1, 3).foreach { parts =>
        val df = vecs.zipWithIndex
          .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
          .toDF("vec_id", "embedding").repartition(parts)
        val got = ext.Similarity.covarianceMatrix(df).collect()
          .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) -> r.getAs[Double]("cov4"))
          .toMap
        got.foreach { case ((i, j), c4) =>
          // trunc4 grid: float-cast inputs and summation order shift the
          // raw value by ulps, so compare on the grid with one-cell slack
          val ref = math.floor(cov(i, j) * 10000.0) / 10000.0
          assert(math.abs(c4 - ref) <= 2e-4 + 1e-9,
            s"cell ($i,$j) got $c4 expected ~$ref (parts=$parts)")
        }
      }
    }
  }

  test("prop: pqEncode total distortion never exceeds flat-kmeans distortion budget per subspace count") {
    import spark.implicits._
    // PQ with m=1 IS kmeansExact (same seeds/rounds): codes and total
    // distortion must agree exactly
    val vecGen: Gen[List[Array[Double]]] =
      Gen.choose(4, 8).flatMap { n =>
        Gen.listOfN(n, Gen.listOfN(4, Gen.chooseNum(-2.0, 2.0)).map(_.toArray))
      }
    cases(vecGen) { vecs =>
      val df = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
        .toDF("vec_id", "embedding")
      val pq = ext.Similarity.pqEncode(df, m = 1, dim = 4, k = 2, rounds = 2)
        .collect().map(r => r.getAs[Long]("vec_id") ->
          (r.getAs[Long]("code0"), r.getAs[Long]("dist_sq6"))).toMap
      val km = ext.Similarity.kmeansExact(df, k = 2, rounds = 2)
        .collect().map(r => r.getAs[Long]("vec_id") ->
          (r.getAs[Long]("cluster"), r.getAs[Long]("dist_sq6"))).toMap
      assert(pq === km)
    }
  }

  test("prop: graft_dbits is strictly order-preserving and codegen agrees with eval") {
    import spark.implicits._
    // magnitudes across many binades, both signs, zeros and denormals —
    // the transform must linearize ALL of them
    val dGen: Gen[List[Double]] = Gen.listOfN(24, Gen.oneOf(
      Gen.chooseNum(-1e12, 1e12),
      Gen.chooseNum(-1e-3, 1e-3),
      Gen.oneOf(0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue)))
    cases(dGen) { xs =>
      val df = xs.toDF("v")
      graft.ext.expr.DoubleOrderBits.ensureRegistered(spark)
      val got = df.selectExpr("v", "graft_dbits(v) AS b").collect()
        .map(r => r.getDouble(0) -> r.getLong(1))
      // order-preserving: sorting by the bit image sorts the doubles
      // (-0.0 vs 0.0: bit image separates them adjacently, which is a
      // valid tie order for equal doubles)
      val byBits = got.sortBy(_._2).map(_._1)
      assert(byBits.zip(byBits.tail).forall { case (a, b) => a <= b },
        s"bit order violates value order: ${byBits.mkString(",")}")
      // interpreted eval path must equal the codegen'd result
      got.foreach { case (v, b) =>
        val raw = java.lang.Double.doubleToLongBits(v)
        val expect = if (raw >= 0L) raw else raw ^ Long.MaxValue
        assert(b === expect, s"v=$v")
      }
    }
  }

  test("prop: weightedMedian matches a brute-force local weighted median at any shift") {
    import spark.implicits._
    val rowGen: Gen[List[(String, Double, Long)]] =
      Gen.choose(1, 40).flatMap { n =>
        Gen.listOfN(n, for {
          g <- Gen.oneOf("A", "B")
          v <- Gen.oneOf(Gen.chooseNum(-100.0, 100.0), Gen.oneOf(1.0, 2.0, 2.0, 3.0))
          w <- Gen.chooseNum(1L, 9L)
        } yield (g, v, w))
      }
    cases(rowGen) { rows =>
      def local(g: String): Option[(Long, Double)] = {
        val vs = rows.filter(_._1 == g).map(t => (t._2, t._3))
        if (vs.isEmpty) None else {
          val tot = vs.map(_._2).sum
          val sorted = vs.groupBy(_._1).view.mapValues(_.map(_._2).sum)
            .toSeq.sortBy(_._1)
          var cum = 0L
          val med = sorted.collectFirst {
            case (v, w) if { cum += w; cum * 2 >= tot } => v
          }.get
          Some((tot, med))
        }
      }
      for (shift <- Seq(30, 44, 60)) {
        val got = ext.Aggregates.weightedMedian(
            rows.toDF("g", "v", "w").repartition(3), "v", "w", "g", shift)
          .collect()
          .map(r => r.getString(0) ->
            (r.getAs[Long]("total_weight"), r.getAs[Double]("w_median"))).toMap
        Seq("A", "B").foreach { g =>
          assert(got.get(g) === local(g), s"group=$g shift=$shift")
        }
      }
    }
  }
}
