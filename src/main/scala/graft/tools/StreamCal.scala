package graft.tools

/** Dev measurement instrument: print N consecutive
  * [[graft.CpuWindow.streamMs]] / spinMs calibrations so the
  * clean-window reference defaults in Bench can be recorded from
  * observed numbers instead of guessed (r16; same class as EnvProfile).
  */
object StreamCal {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5)
    (1 to n).foreach { i =>
      val st = graft.CpuWindow.streamMs()
      val sp = graft.CpuWindow.spinMs()
      println(s"[streamcal] $i stream=[${st._1},${st._2}] " +
        s"spin=[${sp._1},${sp._2}]")
    }
  }
}
