package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{SimJoin, SimJoinOptions}

/**
 * Reproduction of the reference's published benchmark workload
 * (/root/reference/justfile:46-52 + benchmark/bench.py:52-75): fuzzy name-join
 * of 5 000 person names against 100 000, top_n=10, l2 normalization, one
 * wall-clock measurement per call. The reference publishes no absolute numbers
 * (BASELINE.md); this records ours on the same shape.
 *
 * Names are deterministic "First Last" pairs from a seeded LCG over fixed name
 * pools (Faker itself isn't available offline; the trigram profile — cased
 * initials, lowercase runs, ~10 tokens/name — matches).
 */
object RefWorkloadBench {

  private val First = Array(
    "James", "Mary", "Robert", "Patricia", "John", "Jennifer", "Michael", "Linda",
    "David", "Elizabeth", "William", "Barbara", "Richard", "Susan", "Joseph", "Jessica",
    "Thomas", "Sarah", "Charles", "Karen", "Christopher", "Lisa", "Daniel", "Nancy",
    "Matthew", "Betty", "Anthony", "Sandra", "Mark", "Margaret", "Donald", "Ashley",
    "Steven", "Kimberly", "Andrew", "Emily", "Paul", "Donna", "Joshua", "Michelle",
    "Kenneth", "Carol", "Kevin", "Amanda", "Brian", "Melissa", "George", "Deborah",
    "Timothy", "Stephanie", "Ronald", "Rebecca", "Jason", "Sharon", "Edward", "Laura",
    "Jeffrey", "Cynthia", "Ryan", "Dorothy", "Jacob", "Amy", "Gary", "Kathleen")

  private val Last = Array(
    "Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller", "Davis",
    "Rodriguez", "Martinez", "Hernandez", "Lopez", "Gonzalez", "Wilson", "Anderson",
    "Thomas", "Taylor", "Moore", "Jackson", "Martin", "Lee", "Perez", "Thompson",
    "White", "Harris", "Sanchez", "Clark", "Ramirez", "Lewis", "Robinson", "Walker",
    "Young", "Allen", "King", "Wright", "Scott", "Torres", "Nguyen", "Hill", "Flores",
    "Green", "Adams", "Nelson", "Baker", "Hall", "Rivera", "Campbell", "Mitchell",
    "Carter", "Roberts", "Gomez", "Phillips", "Evans", "Turner", "Diaz", "Parker",
    "Cruz", "Edwards", "Collins", "Reyes", "Stewart", "Morris", "Morales", "Murphy")

  private def names(n: Int, seed: Long): Seq[(Long, String)] = {
    var state = seed
    def next(): Long = { state = state * 6364136223846793005L + 1442695040888963407L; state }
    (0 until n).map { i =>
      val f = First(((next() >>> 33) % First.length).toInt)
      val l = Last(((next() >>> 33) % Last.length).toInt)
      (i.toLong, s"$f $l")
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val left = names(5000, seed = 4321L).toDF("id", "name")
    val right = names(100000, seed = 8765L).toDF("id", "name")
    left.write.mode("overwrite").parquet("/tmp/ref_workload/left")
    right.write.mode("overwrite").parquet("/tmp/ref_workload/right")
    val l = spark.read.parquet("/tmp/ref_workload/left")
    val r = spark.read.parquet("/tmp/ref_workload/right")

    // warmup
    SimJoin.keyedPairs(l, "id", "name", r, "id", "name",
      SimJoinOptions(topN = 10, strategy = "direct")).count()

    def time(strategy: String, topN: Int, norm: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = SimJoin.keyedPairs(l, "id", "name", r, "id", "name",
        SimJoinOptions(topN = topN, normalization = norm, strategy = strategy)).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // Default = the FLAGSHIP cell only (top_n=10, l2 — the reference's
    // published `just run-bench` shape, /root/reference/justfile:46-52),
    // repeated reps× per strategy so the receipt carries a warm number.
    // `sweep` arg = the full parameter matrix mirroring the reference's
    // bench dimensions (/root/reference/benchmark/bench.py:161-204):
    // top_n × normalization × physical strategy ("direct", the
    // all-candidates plan, only at top_n=10 — the documented slow baseline).
    val sweep = args.contains("sweep")
    val reps = 3
    val cells =
      if (sweep)
        (for {
          topN <- Seq(1, 10, 50, 100)
          norm <- Seq("l2", "count")
          strategy <- Seq("kernel", "dedup")
        } yield (strategy, topN, norm)) ++
        Seq(("direct", 10, "l2"), ("direct", 10, "count"))
      else Seq(("kernel", 10, "l2"), ("dedup", 10, "l2"), ("direct", 10, "l2"))
    val lines = cells.map { case (strategy, topN, norm) =>
      val runs = (1 to (if (sweep) 1 else reps)).map(_ => time(strategy, topN, norm))
      val best = runs.map(_._1).min
      val n = runs.head._2
      val line =
        f"""{"workload":"faker-names 5000x100000","strategy":"$strategy","top_n":$topN,"normalization":"$norm","sec":$best%.3f,"reps":${runs.size},"rows":$n}"""
      println(line)
      line
    }
    // Durable per-round receipt the driver ships whole (cwd = repo root):
    // one JSON line per cell, best-of-reps wall seconds.
    try {
      val w = new java.io.PrintWriter("REF_WORKLOAD.json", "UTF-8")
      try lines.foreach(w.println) finally w.close()
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
