package graft

/** Shared parser for the `SPARK_GRAFT_EXTRA_CONF` dev hook ("k=v;k=v")
  * used by [[Bench]] and [[Verify]]. Malformed segments are REJECTED
  * LOUDLY instead of silently dropped: a typo'd conf
  * (`spark.graft.checkpoint.dir:/tmp/x`) that fell through the old
  * `filter(_.contains("="))` made a "hardened-mode" gate silently run in
  * default mode — and its byte-identical hashes then read as proof of a
  * mode that never ran. Applied confs are echoed for the same reason:
  * the gate evidence must show which mode actually executed.
  */
object EnvConf {

  /** Parse "k=v;k=v", echoing applied pairs to stderr and throwing on a
    * malformed (no '=', or empty-key) segment.
    */
  def parseExtraConf(raw: Option[String], tag: String): Seq[(String, String)] = {
    val pairs = raw.toSeq
      .flatMap(_.split(";"))
      .map(_.trim)
      .filter(_.nonEmpty)
      .map { kv =>
        val a = kv.split("=", 2)
        if (a.length != 2 || a(0).trim.isEmpty)
          throw new IllegalArgumentException(
            s"[$tag] malformed SPARK_GRAFT_EXTRA_CONF segment '$kv' " +
              "(want key=value;key=value)")
        (a(0).trim, a(1))
      }
    pairs.foreach { case (k, v) =>
      System.err.println(s"[$tag] applying extra conf $k=$v")
    }
    pairs
  }
}
