package graft.ts

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** z32 — the multi-tenant shape: the reference daemon runs up to 64
  * concurrent stream-processor instances (`main/stream_procs.c:53`),
  * each with private PSI state. Here 64 instance-tagged replays of the
  * capture (instance i starting i packets in, so every instance's
  * in-flight assembly state differs) run through ONE pipeline
  * invocation with the instance id in every shuffle key, and every
  * instance must converge to exactly the single-instance PAT/PMT —
  * the isolation a 100-TB multi-tenant deployment depends on. Wall
  * times for N=1 vs N=64 land on stderr (and in COVERAGE.md). */
class MultiInstanceSpec extends graft.SparkSuite {

  test("z32: 64 instance-tagged replays keep per-instance PAT/PMT " +
    "state isolated and converge to the single-instance tables") {
    val s = spark
    import s.implicits._

    def timed[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(
        f"[z32] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // session warm-up outside any timed span (first-session scan +
    // codegen costs ~7 s that would otherwise be billed to the N=1 leg)
    TsPipeline.packets(s).count()
    // reference tables through the standard single-instance path —
    // the ground truth every instance must converge to (untimed; it
    // assembles from the full unfiltered capture, a different shape)
    val (basePat, basePmt) = {
      val secs = TsPipeline.psiSections(s, TsPipeline.packets(s))
      val latest = TsPipeline.latestTables(secs)
      val pat = TsPipeline.patFromLatest(s, latest).collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSet
      val pmt = TsPipeline.pmtFromLatest(s, latest).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getInt(4))).toSet
      (pat, pmt)
    }
    assert(basePat.nonEmpty && basePmt.nonEmpty)
    // tenancy cost baseline: the SAME multi-instance code path at n=1
    timed("n=1 multi-path capture->tables") {
      TsPipeline.latestTables(TsPipeline.multiInstanceSections(s, 1))
        .count()
    }

    val n = 64
    val (pats, pmts) = timed(s"n=$n capture->tables") {
      val latest = TsPipeline.latestTables(
        TsPipeline.multiInstanceSections(s, n))
      val ps = Encoders.product[PsiSection]
      val pats = latest.filter(col("tableId") === 0x00).as[PsiSection](ps)
        .flatMap(sec => PsiCodec.decodePat(sec).map(e =>
          (sec.pid >> 13, e.programNumber, e.referencePid)))
        .collect()
      val pmts = latest.filter(col("tableId") === 0x02).as[PsiSection](ps)
        .flatMap { sec =>
          PsiCodec.decodePmt(sec).toSeq.flatMap { p =>
            p.es.map(e => (sec.pid >> 13, p.programNumber,
              sec.pid & 0x1FFF, p.pcrPid, e.streamType, e.elementaryPid))
          }
        }
        .collect()
      (pats, pmts)
    }

    // every instance present, and EVERY instance's tables equal the
    // single-instance result — no instance lost state, none absorbed
    // another's (a leak would corrupt a shifted instance's sections
    // and fail its CRC/version gates → a visible diff here)
    val patByInst = pats.groupBy(_._1)
    val pmtByInst = pmts.groupBy(_._1)
    assert(patByInst.keySet == (0 until n).toSet,
      s"missing PAT instances: ${(0 until n).toSet -- patByInst.keySet}")
    assert(pmtByInst.keySet == (0 until n).toSet,
      s"missing PMT instances: ${(0 until n).toSet -- pmtByInst.keySet}")
    (0 until n).foreach { i =>
      val pat = patByInst(i).map(t => (t._2, t._3)).toSet
      assert(pat == basePat, s"instance $i PAT diverged: $pat")
      val pmt = pmtByInst(i).map(t => (t._2, t._3, t._4, t._5, t._6)).toSet
      assert(pmt == basePmt, s"instance $i PMT diverged: $pmt")
    }
  }
}
