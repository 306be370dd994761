package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.IvfKernels
import graft.operators.Dedup

/** Property-based checks for the round-4 rewrites — the components
  * whose correctness rests on arithmetic/graph invariants rather than
  * a single worked example:
  *  - connectedComponents (accumulator-fused pointer doubling) against
  *    a driver-side union-find reference on random graphs
  *  - the IVF NearestCell/ProbeCells kernels against brute-force
  *    argmin/top-k with the same (key asc, cell asc) tie-break
  * Raw scalacheck (no scalatest bridge in the offline cache), seeded
  * for reproducibility.
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark._

  private def checkProp(prop: Prop, cases: Int): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(cases)
      .withInitialSeed(Seed(20260812L))
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  // ---- connected components vs union-find ----

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = parent.keys.toSeq
    val roots = members.map(m => m -> find(m)).toMap
    val minOf = roots.groupBy(_._2).map { case (r, ms) => r -> ms.keys.min }
    members.map(m => m -> minOf(roots(m))).toMap
  }

  test("connectedComponents equals union-find on random graphs (chains, stars, self-loops, dup edges)") {
    import spark.implicits._
    val genEdges = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 80)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1)
        b <- Gen.choose(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield edges
    // each case runs the REAL distributed operator; 10 cases keeps the
    // suite fast while covering chains, stars, self-loops, dup edges
    checkProp(Prop.forAllNoShrink(genEdges) { edges =>
      val expected = unionFind(edges)
      val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      CachePool.drain()
      got == expected
    }, cases = 10)
  }

  // ---- IVF kernels vs brute force ----

  private val genModel = for {
    dim <- Gen.choose(2, 8)
    cells <- Gen.choose(1, 10)
    cent <- Gen.listOfN(cells, Gen.option(Gen.listOfN(dim, Gen.choose(-5, 5).map(_.toDouble))))
    v <- Gen.listOfN(dim, Gen.choose(-5, 5).map(_.toDouble))
    if cent.exists(_.isDefined)
  } yield (cent.map(_.map(_.toArray).orNull).toArray, v.toArray)

  private def keysOf(cent: Array[Array[Double]], csq: Array[Double], v: Array[Double]) =
    cent.indices.collect {
      case j if cent(j) != null =>
        (csq(j) - 2.0 * cent(j).zip(v).map { case (c, x) => c * x }.sum, j)
    }

  test("NearestCell kernel equals brute-force argmin with (key, cell) tie-break, null cells skipped") {
    checkProp(Prop.forAll(genModel) { case (cent, v) =>
      val csq = cent.map(c => if (c == null) 0.0 else c.map(x => x * x).sum)
      val expected = keysOf(cent, csq, v).sortBy(identity).headOption.map(_._2).getOrElse(-1)
      IvfKernels.nearestCell(new GenericArrayData(v), cent, csq) == expected
    }, cases = 200)
  }

  test("ProbeCells kernel returns the exact top-nprobe prefix of the full (key, cell) ordering") {
    checkProp(Prop.forAll(genModel, Gen.choose(1, 12)) { case ((cent, v), nprobe) =>
      val csq = cent.map(c => if (c == null) 0.0 else c.map(x => x * x).sum)
      val expected = keysOf(cent, csq, v).sortBy(identity).take(nprobe).map(_._2).toSeq
      IvfKernels.probeCells(new GenericArrayData(v), cent, csq, nprobe).toIntArray().toSeq == expected
    }, cases = 200)
  }

  // ---- media container parsers: refuse or degrade, never throw ----
  // A corrupt payload in a 100 TB media lake must surface as a flag
  // on its row; any kernel exception fails the task 4x and kills the
  // whole job. Fuzz the three executor-side entry points with noise,
  // truncations, and single-byte flips of VALID containers (the flips
  // exercise every internal parse branch: header fields, frame
  // markers, segment lengths, plane sizes).

  private val mediaSeeds: Seq[Array[Byte]] = {
    def img(seed: Int): java.awt.image.BufferedImage = {
      val im = new java.awt.image.BufferedImage(16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 12).foreach(y => (0 until 16).foreach { x =>
        val v = (x * 13 + y * 7 + seed * 31) % 256
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
      })
      im
    }
    def enc(fmt: String, seed: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img(seed), fmt, out)
      out.toByteArray
    }
    val y4m = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("YUV4MPEG2 W16 H12 F25:1 Ip A1:1 C420\n".getBytes("US-ASCII"))
      (0 until 2).foreach { f =>
        out.write("FRAME\n".getBytes("US-ASCII"))
        out.write(Array.tabulate(16 * 12 + 2 * 8 * 6)(i => ((i * 31 + f) % 256).toByte))
      }
      out.toByteArray
    }
    val wav = {
      import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
      val bytes = Array.tabulate(2000)(i => ((i * 73) % 256).toByte)
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, 1000L), AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    Seq(y4m, enc("jpg", 1) ++ enc("jpg", 2), enc("png", 3), wav)
  }

  test("video/image decode, frame sampling, and aHash never throw on noise, truncated, or bit-flipped payloads") {
    import graft.operators.Multimodal
    val genPayload: Gen[Array[Byte]] = Gen.oneOf(
      Gen.containerOf[Array, Byte](Gen.choose(-128, 127).map(_.toByte)),
      for {
        base <- Gen.oneOf(mediaSeeds)
        cut <- Gen.choose(0, base.length)
      } yield base.take(cut),
      for {
        base <- Gen.oneOf(mediaSeeds)
        i <- Gen.choose(0, base.length - 1)
        b <- Gen.choose(-128, 127)
      } yield { val c = base.clone(); c(i) = b.toByte; c })
    checkProp(Prop.forAll(genPayload) { p =>
      Multimodal.JdkVideoDecode.decode(p)
      Multimodal.JdkVideoFrames.frames(p, 3)
      Multimodal.AHash60.hash(p)
      Multimodal.ImageIoDecode.decode(p)
      Multimodal.AudioHash60.hash(p)
      true // reaching here = no exception escaped any kernel
    }, cases = 400)
  }
}
