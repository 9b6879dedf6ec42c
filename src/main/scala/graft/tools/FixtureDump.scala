package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import graft.corpus.Corpus

/** Dev utility: dumps (url \t html) TSV of the synthetic corpus plus
  * hand-written adversarial pages, and the lexicon, for the out-of-repo
  * golden-generation harness that runs the same inputs through the compiled
  * REFERENCE classes (see src/test/resources/termcounts_golden.tsv header).
  * Usage: runMain graft.tools.FixtureDump <outDir> [numDocs]
  */
object FixtureDump {
  def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t").replace("\r", "\\r").replace("\n", "\\n")

  /** Adversarial pages exercising tokenizer/boost edge cases beyond what the
    * random corpus hits: empty body, tag-only page, nested tags in titles,
    * boost-order-sensitive stem overwrites, tokens at filter boundaries. */
  def adversarial: Seq[(String, String)] = Seq(
    "http://adv.example/empty" -> "",
    "http://adv.example/tagsonly" -> "<html><body></body></html>",
    "http://adv.example/warandpeace" ->
      ("<h1>apparently trying to</h1>recollect \r\nsomething. \r\nPrince \r\nAndrew \r\nstepped \r\nforward" +
       " \r\nfrom \r\n<h1>among</h1> \r\nthe\r\nsuite \r\nand \r\nsaid \r\nin \r\nFrench:\r\n\r\n\"You \r\ntold" +
       " \r\nme \r\nto \r\nremind \r\nyou \r\nof \r\nthe \r\nofficer \r\nDolokhov, \r\n<h2>reduced</h2> \r\nto" +
       " \r\nthe\r\nranks<p>in</p>this \r\nregiment.\"\r\n\r\n\"Where \r\nis \r\nDolokhov?\" \r\nasked \r\nKutuzov.\r\n" +
       "Dolokhov, </p>\r\nwho \r\nhad \r\n<title>already</title> \r\nchanged \r\ninto \r\na \r\nsoldier's \r\ngray \r\ngreatcoat,"),
    "http://adv.example/stemboost" ->
      "<html><title>running abilities galaxy</title><h1>running running</h1><p>running abilities galaxy run ran runs ability</p></html>",
    "http://adv.example/boundaries" ->
      ("<html><p>999 1000 abc ABC The THE café x" + ("y" * 100) + " 0 12 123 1234 a-b don’t it's (quoted) end.</p></html>"),
    "http://adv.example/nestedtitle" ->
      "<html><title>the <b>galaxy</b> engine</title><h2>of <i>search</i></h2><p>the engine of search</p></html>",
    "http://adv.example/multititle" ->
      "<html><title>galaxy</title><title>engine</title><h1>galaxy</h1><p>body galaxy</p></html>",
    "http://adv.example/urlboost-search-engine" ->
      "<html><p>the</p></html>",
    "https://adv.example:443/the/galaxy/search" ->
      "<html><p>word</p></html>"
  )

  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val numDocs = if (args.length > 1) args(1).toLong else 60L
    Files.createDirectories(outDir)
    val pages = Corpus.generateLocal(numDocs).map(p => (p.url, new String(p.html, "UTF-8"))) ++ adversarial
    val tsv = pages.map { case (u, h) => esc(u) + "\t" + esc(h) }.mkString("\n") + "\n"
    Files.write(outDir.resolve("termcounts_input.tsv"), tsv.getBytes(StandardCharsets.UTF_8))
    Files.write(outDir.resolve("lexicon.txt"),
      (Corpus.lexicon.toSeq.sorted.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    println(s"wrote ${pages.size} pages to $outDir")
  }
}
