package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Goldens derived by executing the reference chain
  * (arxiv/arxiv_finder/name2arxivid.py:31-133) with CPython `re` —
  * see fixtures/arxiv_golden.json.
  */
class TitleCleanSpec extends AnyFunSuite {
  import TitleClean._

  test("E10 clean_title golden chain") {
    assert(cleanTitle("paper_Deep-Stereo_Matching_CVPR2024.pdf") ==
      "Deep Stereo Matching")
    assert(cleanTitle("ArXiv: Attention is all you need 2017 final") ==
      "Attention is all you need")
    assert(cleanTitle("draft-Graph_Neural_Networks_ICLR 2023 paper") ==
      "Graph Neural Networks")
    assert(cleanTitle("A 2021 study of SIGMOD systems.txt") ==
      "A study of SIGMOD systems")
    assert(cleanTitle("preprint: flow matching version") == "flow matching")
  }

  test("E11 search variants: set contract, deterministic first-occurrence order") {
    assert(searchVariants("Attention is all you need") == Vector(
      "Attention is all you need",
      "\"Attention is all you need\"",
      "Attention is all you"))
    assert(searchVariants("Deep Learning") == Vector(
      "Deep Learning", "\"Deep Learning\""))
    assert(searchVariants("a study of the transformers in vision") == Vector(
      "a study of the transformers in vision",
      "\"a study of the transformers in vision\"",
      "a study of the",
      "a study of the transformers in"))
  }
}
