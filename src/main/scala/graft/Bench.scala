package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (QueryDef.benchmark) on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
  *
  * Each query is forced with a full-result noop action (count over the
  * final plan) after a JVM/session warmup pass so codegen + classloading
  * don't land in the first measured query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: touch every table + exercise codegen/shuffle machinery once.
    // Per-table try: one broken loader must not kill the whole bench
    // (round 6 lost ALL timings to a single events read failure) — the
    // queries that depend on it will record their own -1 sentinel below.
    Tables.names.foreach { n =>
      try {
        val df = if (n == "events") Tables.events(spark, sfDir)
                 else Tables.load(spark, sfDir, n)
        df.count()
      } catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $n failed: ${e.getMessage}")
      }
    }
    try operators.Relational.pricingSummary(spark, sfDir).count()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warmup query failed: ${e.getMessage}")
    }

    // per-query warmup run (codegen compile, page cache), then two timed
    // runs; report the min AND every raw sample. Caches are cleared
    // before each timed run so queries that persist intermediates
    // (signature tables) re-pay that cost in the measured run. Min-of-2
    // damps transient host contention (a co-scheduled process can
    // inflate one sample 10-30x; see BUILD_NOTES round-4 trajectory)
    // without hiding real plan cost; the per-sample spread in the JSON
    // makes the two cases distinguishable after the fact — a query at
    // samples [2.1, 8.6] was contended, one at [8.4, 8.6] regressed.
    // a failed query records -1 (not its near-zero elapsed time) so a
    // broken benchmark can't silently read as fast-and-successful
    val results = SparkEntry.benchQueries.map { d =>
      try d.build(spark, sfDir).count()
      catch { case _: Throwable => () }
      val samples = (1 to 2).map { _ =>
        operators.ScaledWindows.release()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val ok =
          try { d.build(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] ${d.name} failed: ${e.getMessage}")
            false
          }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      (d.name, if (samples.exists(_ < 0)) -1.0 else samples.min, samples)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, _, ss) =>
      "\"" + k + "\":" + ss.map(s => f"$s%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, v, _) if v < 0 => "\"" + k + "\"" }
    val errsJson = if (errors.isEmpty) "" else errors.mkString(""","errors":[""", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // the round-1..7 benchmark set, reported as its own subtotal so the
    // cross-round trajectory stays comparable after the set widened
    val core16 = Set(
      "q01_pricing_summary", "q02_revenue_filter", "q03_top_revenue_orders",
      "q04_region_revenue", "q11_window_running_total", "q20_json_events",
      "q26_hourly_events", "q46_asof_join", "q29_session_windows",
      "q36_corpus_prep", "q32_quality_score", "q35_jaccard_pairs",
      "q40_minhash_lsh", "q41_simhash", "q42_knn_bruteforce",
      "q43_ann_hyperplane")
    val coreTotal = results.collect { case (k, v, _) if core16(k) && v >= 0 => v }.sum
    val vsPrev = vsPrevBlock(results)
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","core16_total":$coreTotal%.3f,"queries":$qs,"samples":$spread$errsJson$vsPrev,"sf":"$sfDir"}"""
    println(line)
    // Persist the COMPLETE result line as a repo-root round artifact:
    // the driver's BENCH_r{N}.json stores only the last 2000 chars of
    // the run log, and with 39 benched queries the result line no
    // longer fits — r10's tail begins mid-samples-object, which is why
    // parsePrevResult needs salvage paths at all. Next round's
    // vsPrevBlock prefers this file (full fidelity) over the tail.
    try Timings.currentRound(new java.io.File(".")).foreach { n =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"BENCHFULL_r$n.json"), line)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] BENCHFULL artifact skipped: ${e.getMessage}")
    }
    spark.stop()
  }

  /** Mechanical round-over-round diff: locate the latest BENCH_r{N}.json
    * the driver wrote in the repo root, extract its embedded result line,
    * and emit per-query ratios plus a `flagged` subset (>1.5× either
    * way) WITH both rounds' raw samples — so a flagged move is
    * immediately classifiable as contention (wide spread) vs regression
    * (tight spread) without narrative reconstruction. Absent or
    * unparsable prior files degrade to an empty block, never a failure.
    */
  /** Extract a prior round's (per-query min times, per-query samples)
    * from a driver log tail. Primary path: the full result line.
    * Fallback: the driver's log tail can truncate at the HEAD of the
    * result line (observed in BENCH_r09: the tail begins mid-queries
    * object), in which case the line regex finds nothing but the
    * complete `"samples":{...}` object usually survives — and the
    * reported per-query value IS samples.min, so the prior round
    * reconstructs from samples alone. The samples object contains no
    * nested braces (values are arrays), so [^{}]* is exact;
    * `prev_samples`/`cur_samples` inside a flagged block don't match
    * the quoted literal. Package-private: BenchVsPrevSpec pins both
    * paths. Never throws on garbage — returns empty maps.
    */
  private[graft] def parsePrevResult(
      hay: String): (Map[String, Double], Map[String, List[Double]]) = {
    import org.json4s._
    val lineRx = """\{"metric":"total".*?"sf":"[^"]*"\}""".r
    // NOT `.getOrElse(return ...)`: a non-local return from a by-name
    // closure throws NonLocalReturnControl, which callers wrapping this
    // in `catch Throwable` would intercept spuriously (ADVICE r9).
    val innerOpt = lineRx.findAllIn(hay).toSeq.lastOption
    def samplesOf(json: JValue): Map[String, List[Double]] =
      (json \ "samples") match {
        case JObject(fs) => fs.collect { case (k, JArray(vs)) =>
          (k, vs.collect { case JDouble(v) => v; case JInt(v) => v.toDouble })
        }.toMap
        case _ => Map.empty[String, List[Double]]
      }
    innerOpt match {
      case Some(inner) =>
        val parsed = org.json4s.jackson.JsonMethods.parse(inner)
        val q = (parsed \ "queries") match {
          case JObject(fs) => fs.collect {
            case (k, JDouble(v)) => (k, v)
            case (k, JInt(v)) => (k, v.toDouble)
          }.toMap
          case _ => Map.empty[String, Double]
        }
        (q, samplesOf(parsed))
      case None =>
        val sampRx = "\"samples\":\\{[^{}]*\\}".r
        sampRx.findFirstIn(hay) match {
          case Some(frag) =>
            val parsed = org.json4s.jackson.JsonMethods.parse("{" + frag + "}")
            val s = samplesOf(parsed)
            val q = s.collect {
              case (k, vs) if vs.nonEmpty && vs.forall(_ > 0) => (k, vs.min)
            }
            (q, s)
          case None =>
            // Last salvage: the tail can begin INSIDE the samples
            // object (BENCH_r10 shape — the opener itself was cut), so
            // neither regex above matches, yet most per-query sample
            // arrays survive verbatim. Harvest every array-valued
            // entry, excluding the flagged block's prev_samples/
            // cur_samples (the only other array-valued keys this
            // writer emits). Partial prior data yields a partial —
            // still useful — vs_prev over the intersection.
            val entryRx = """"([A-Za-z0-9_]+)"\s*:\s*\[([0-9.,\s-]*)\]""".r
            val s = entryRx.findAllMatchIn(hay).collect {
              case m if m.group(1) != "prev_samples" &&
                  m.group(1) != "cur_samples" =>
                (m.group(1), m.group(2).split(",").toList
                  .map(_.trim).filter(_.nonEmpty)
                  .flatMap(v => scala.util.Try(v.toDouble).toOption))
            }.toMap
            val q = s.collect {
              case (k, vs) if vs.nonEmpty && vs.forall(_ > 0) => (k, vs.min)
            }
            (q, s)
        }
    }
  }

  private def vsPrevBlock(
      results: Seq[(String, Double, Seq[Double])]): String = {
    try {
      // BENCHFULL_r{N} (our own complete-line artifact) outranks the
      // driver's BENCH_r{N} log tail for the same round: the tail is
      // capped at 2000 chars and truncates mid-line once the bench set
      // is large, degrading the prior round to a salvage parse
      val rx = """(BENCHFULL|BENCH)_r(\d+)\.json""".r
      // exclude the CURRENT round: a builder-run bench writes
      // BENCHFULL_r{N} mid-round, and the driver's end-of-round run
      // must still diff against round N-1, not against that artifact
      val curRound = Timings.currentRound(new java.io.File("."))
        .getOrElse(Int.MaxValue)
      val files = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
        .flatMap { f =>
          f.getName match {
            case rx(kind, n) if n.toInt < curRound =>
              Some(((n.toInt, kind == "BENCHFULL"), f))
            case _ => None
          }
        }
      if (files.isEmpty) return ""
      val ((prevN, _), prevFile) = files.maxBy(_._1)
      val text = new String(
        java.nio.file.Files.readAllBytes(prevFile.toPath), "UTF-8")
      import org.json4s._
      // the driver wraps the result line inside a log-tail STRING field
      // (quotes escaped) — parse the wrapper first, then regex inside
      // the unescaped tail; fall back to the raw text for bare files
      val outer = scala.util.Try(org.json4s.jackson.JsonMethods.parse(text))
      val hay = outer.toOption.flatMap { o =>
        (o \ "tail") match {
          case JString(s) => Some(s)
          case _ => None
        }
      }.getOrElse(text)
      val (prevQ, prevS) = parsePrevResult(hay)
      if (prevQ.isEmpty) return ""
      val ratios = results.flatMap { case (k, cur, _) =>
        prevQ.get(k).filter(p => p > 0 && cur > 0).map(p => (k, p, cur, cur / p))
      }
      if (ratios.isEmpty) return ""
      val rjson = ratios.map { case (k, _, _, r) => "\"" + k + "\":" + f"$r%.2f" }
        .mkString("{", ",", "}")
      // Floor normalization (VERDICT r9 #7): q000_bench_floor measures
      // the fixed per-query harness overhead (count over a 1-row
      // relation). When both rounds carry it, ratios are compared on
      // floor-SUBTRACTED times, so a 0.1 s drift in session overhead no
      // longer reads as a 1.3× "regression" on a 0.3 s query. Degrades
      // to raw ratios when either round lacks the floor entry.
      val floorName = "q000_bench_floor"
      val floorCur = results.find(_._1 == floorName).map(_._2).filter(_ > 0)
      val floorPrev = prevQ.get(floorName).filter(_ > 0)
      def adjRatio(k: String, p: Double, c: Double): Option[Double] = for {
        fp <- floorPrev; fc <- floorCur
        if k != floorName && p - fp > 0.02 && c - fc > 0
      } yield (c - fc) / (p - fp)
      // Tightened flag (VERDICT r9 #2): when BOTH rounds' samples are
      // tight (max/min < 1.15 — no contention signature), a 1.25× move
      // is already suspicious; the 1.5× band applies only when spread
      // says a sample may be contended. r9's q29 (1.35×, two
      // consistently-elevated samples) slipped under the flat 1.5×.
      def tight(ss: Seq[Double]): Boolean =
        ss.size >= 2 && ss.forall(_ > 0) && ss.max / ss.min < 1.15
      val flagged = ratios.flatMap { case (k, p, c, r) =>
        val curS = results.find(_._1 == k).map(_._3).getOrElse(Seq.empty)
        val pS = prevS.getOrElse(k, Nil)
        val bothTight = tight(curS) && tight(pS)
        val thr = if (bothTight) 1.25 else 1.5
        val eff = adjRatio(k, p, c).getOrElse(r)
        if (eff > thr || eff < 1.0 / thr) {
          val note =
            if (eff < 1.0) "improvement"
            else if (bothTight) "tight-spread regression candidate"
            else "wide-spread: likely contention drift, check samples"
          Some((k, p, c, r, eff, thr, note, curS, pS))
        } else None
      }
      val fjson = flagged.map { case (k, p, c, r, eff, thr, note, curS, pS) =>
        val ps = pS.map(v => f"$v%.3f").mkString("[", ",", "]")
        val cs = curS.map(v => f"$v%.3f").mkString("[", ",", "]")
        "\"" + k + "\":" +
          f"""{"prev":$p%.3f,"cur":$c%.3f,"ratio":$r%.2f,"adj_ratio":$eff%.2f,"threshold":$thr%.2f,"note":"$note","prev_samples":$ps,"cur_samples":$cs}"""
      }.mkString("{", ",", "}")
      val floorJson = floorCur.map(f => f""","floor":$f%.3f""").getOrElse("")
      s""","vs_prev":{"prev_round":$prevN$floorJson,"ratios":$rjson,"flagged":$fjson}"""
    } catch { case e: Throwable =>
      System.err.println(s"[bench] vs_prev diff skipped: ${e.getMessage}")
      ""
    }
  }
}
