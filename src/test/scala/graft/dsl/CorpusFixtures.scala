package graft.dsl

import scala.io.Source

/** Loaders for the reference's golden corpus fixtures (ported verbatim from
  * reference: integration/correctness/src/test/resources/simple_cases and
  * sql/test; assertions modeled on SimpleCasesTest.scala:447-483).
  */
object CorpusFixtures {

  final case class CorpusCase(id: Int, sourceCode: String)

  private def read(path: String): String = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing test resource $path")
    val src = Source.fromInputStream(in, "UTF-8")
    try src.mkString finally src.close()
  }

  /** patterns.json is flat and regular; extract (id, sourceCode) without a
    * JSON dependency (none is available offline).
    */
  def patterns(group: String): Seq[CorpusCase] = {
    val text = read(s"/simple_cases/$group/patterns.json")
    val re = """(?s)"id":\s*(\d+).*?"sourceCode":\s*"([^"]*)"""".r
    re.findAllMatchIn(text).map(m => CorpusCase(m.group(1).toInt, m.group(2))).toSeq
  }

  /** incidents.json: expected incident count per pattern id. */
  def expectedCounts(group: String): Map[Int, Int] = {
    val text = read(s"/simple_cases/$group/incidents.json")
    val re = """"(\d+)":\s*"(\d+)"""".r
    re.findAllMatchIn(text).map(m => m.group(1).toInt -> m.group(2).toInt).toMap
  }

  /** timestamps.csv: expected (from, to) epoch-second pairs per pattern id. */
  def expectedTimestamps(group: String): Map[Int, Seq[(Long, Long)]] = {
    val text = read(s"/simple_cases/$group/timestamps.csv")
    text.linesIterator.filter(_.trim.nonEmpty).toSeq
      .map { line =>
        val parts = line.split(",").map(_.trim)
        (parts(0).toInt, (parts(1).toDouble.toLong, parts(2).toDouble.toLong))
      }
      .groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).sorted }
  }

  def tableResource(name: String): String = {
    // Spark needs a file path; copy the resource to a temp file once
    val text = read(s"/tables/$name")
    val f = java.io.File.createTempFile(name, ".csv")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath, text)
    f.getAbsolutePath
  }
}
