package graft.analyze

/** Frozen BPE merge table for the q94 correctness gate.
  *
  * Trained once with [[TextAnalysis.bpeTrain]] (nMerges = 32,
  * batchCap = 1 — the sf0.001 corpus has natural pair-count ties, where
  * prefix batching may reorder commuting merges; serial training is the
  * reproducible reference) over the sf0.001 `documents` fixture and
  * frozen here as literals, so the
  * segmentation operator can be oracle-gated: the DuckDB oracle replays
  * the SAME merge list (OracleSql builds the replace-chain SQL from this
  * constant), which is only possible when the model is a fixed value
  * rather than retrained per run. This mirrors production shape too: a
  * tokenizer is trained once and shipped as an artifact; segmentation is
  * the hot-path operator that runs over the 100 TB corpus.
  *
  * Merge rank order matters (rules replay in training order); pairs are
  * (left, right) symbols, `</w>` is the end-of-word marker. No left side
  * contains `</w>` (it is a terminal suffix), so per-word and whole-
  * stream replay agree — the oracle still replays per-word to mirror
  * [[TextAnalysis.bpeSegment]] exactly.
  */
object BpeFixture {
  val merges: Seq[(String, String)] = Seq(
    ("e", "r"),
    ("e", "</w>"),
    ("n", "</w>"),
    ("o", "r"),
    ("t", "</w>"),
    ("er", "</w>"),
    ("o", "w"),
    ("ow", "</w>"),
    ("l", "u"),
    ("i", "n"),
    ("y", "</w>"),
    ("a", "r"),
    ("p", "ar"),
    ("g", "</w>"),
    ("a", "s"),
    ("h", "</w>"),
    ("a", "</w>"),
    ("s", "t"),
    ("a", "t"),
    ("a", "n</w>"),
    ("c", "an</w>"),
    ("s", "can</w>"),
    ("c", "o"),
    ("co", "lu"),
    ("colu", "m"),
    ("colum", "n</w>"),
    ("d", "ow</w>"),
    ("in", "dow</w>"),
    ("w", "indow</w>"),
    ("d", "er</w>"),
    ("or", "der</w>"),
    ("or", "t</w>"))
}
