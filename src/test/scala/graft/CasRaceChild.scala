package graft

import org.apache.hadoop.fs.Path

/** Forked-JVM worker for the MULTI-PROCESS commit-CAS race: the
  * in-process racer specs share one JVM, but link(2) arbitration is
  * kernel-side — this main lets the spec prove it across real process
  * boundaries. Spins on the parent's `start` barrier, then races every
  * round's manifest name through [[graft.sources.WarehouseFs
  * .HadoopCommitGuard]], recording the rounds it won to `wins-<id>`.
  * No Spark session — raw Hadoop local FS, so startup is milliseconds
  * and the two processes genuinely overlap. */
object CasRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(dir, id, roundsS) = args
    val rounds = roundsS.toInt
    val base = new Path(dir)
    val fs = base.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val start = new Path(base, "start")
    val deadline = System.currentTimeMillis() + 60000
    while (!fs.exists(start)) {
      if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException("start barrier never appeared")
      Thread.sleep(2)
    }
    val wins = new StringBuilder
    var i = 0
    while (i < rounds) {
      if (graft.sources.WarehouseFs.HadoopCommitGuard.commit(fs,
          new Path(base, f"$i%08d"), s"winner-$id".getBytes("UTF-8")))
        { wins.append(i).append('\n'); () }
      i += 1
    }
    val out = fs.create(new Path(base, s"wins-$id"), true)
    try out.write(wins.toString.getBytes("UTF-8")) finally out.close()
  }
}
