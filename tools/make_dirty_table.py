#!/usr/bin/env python3
"""Build an adversarial copy of a testdata sfDir: same tables plus the
degenerate rows a real web corpus contains and the synthetic generator
never emits — null-text documents (failed extractions), empty and
whitespace-only documents (incl. tab/newline edges, where Java's
split("\\s+") and DuckDB's regexp_split_to_array disagree about empty
tokens), and ragged/null-lane/NULL embedding vectors.

Usage: python3 tools/make_dirty_table.py <clean_sfdir> <out_dir>

Then the standard driver contract must STILL read all-green:
    sbt -batch "runMain graft.Verify <out_dir> /tmp/verify_dirty"
    python3 tools/check_oracle.py <out_dir> /tmp/verify_dirty
This is the robustness leg behind the engine-vs-oracle null/validity
mirrors (valid-vector CTEs, fail-closed funnel flags, null-propagating
q30 diagnostics, zero-byte q27 blobs).
"""
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main(src: str, dst: str) -> None:
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(src, dst)

    t = pq.read_table(f"{src}/documents.parquet")
    cols = {n: t.column(n).to_pylist() for n in t.schema.names}
    maxid = max(cols["doc_id"])

    def add_doc(doc_id, text):
        for n in t.schema.names:
            if n == "doc_id":
                cols[n].append(doc_id)
            elif n == "text":
                cols[n].append(text)
            elif n == "n_chars":
                cols[n].append(0 if text is None else len(text))
            elif n == "lang":
                cols[n].append("en")
            elif n == "source":
                cols[n].append("src1")
            else:
                cols[n].append(None)

    add_doc(maxid + 1, None)  # failed extraction
    add_doc(maxid + 2, None)  # second null text: same dedup class
    add_doc(maxid + 3, "")  # empty doc
    add_doc(maxid + 4, "   ")  # all-space (trims to empty)
    add_doc(maxid + 5, "\t\n ")  # tab/newline-only: the Java-vs-DuckDB
    #                              split-artifact divergence class
    add_doc(maxid + 6, "edge token body\t")  # trailing-tab text
    add_doc(maxid + 7, "\tleading tab body")  # leading-tab text
    add_doc(maxid + 8, "verti\x0bcal tab doc")  # \x0B: in Java's \s
    #                     (both Spark tokenizers split) but NOT in RE2's
    # unicode classes where Spark lower() == DuckDB lower(): astral
    # codepoints (length() = codepoints on both engines), accented
    # Latin. KNOWN LIMIT (probed, excluded here): DuckDB lower()
    # diverges from Java/Spark full Unicode case mapping on
    # locale-special forms — Turkish dotted I (Spark 'i'+combining dot,
    # DuckDB plain 'i') and Greek word-final sigma (Java maps the final
    # one to 'ς' context-sensitively) — not expressible in SQL; the
    # oracle contract assumes case-fold-stable text and the engine's
    # own lower() is authoritative (kernel == Spark lower() is
    # spec-pinned in TextExpressionsSpec).
    add_doc(maxid + 9,
            "\U0001D518nicode \U0001F600 astral \U0001D518nicode body")
    add_doc(maxid + 10, "ÆON æon naïve café "
            "naïve café end")
    # non-\s unicode separators: NBSP and U+2028 are whitespace to a
    # human but NOT in Java's \s (= [ \t\n\x0B\f\r]) nor the oracle's
    # explicit class — both engines must keep them INSIDE one token
    add_doc(maxid + 11, "nbsp\u00a0joined token body")
    add_doc(maxid + 12, "para\u2028separator token body")
    add_doc(maxid + 13, "line one\r\nline two\r\n")  # CRLF: \r and \n
    #                     are both-engine whitespace; trailing CRLF hits
    #                     the Java trailing-empty-token drop again
    add_doc(maxid + 14, "nul\x00byte token body")  # U+0000 is a valid
    #                     codepoint both engines must carry, not truncate
    add_doc(maxid + 15, ("dup " * 500) + "dup")  # one token repeated
    #                     501×: within-doc hot gram — dup-trigram
    #                     coverage saturates, the LM sees one bigram 500
    #                     times, dup-span shingles all collide
    pq.write_table(
        pa.table({n: pa.array(cols[n], type=t.schema.field(n).type)
                  for n in t.schema.names}),
        f"{dst}/documents.parquet")

    e = pq.read_table(f"{src}/embeddings.parquet")
    ec = {n: e.column(n).to_pylist() for n in e.schema.names}
    maxv = max(ec["vec_id"])

    def add_vec(vid, emb, label):
        ec["vec_id"].append(vid)
        ec["embedding"].append(emb)
        ec["label"].append(label)

    add_vec(maxv + 1, [1.0, 2.0], 3)  # ragged (also a k-NN query id
    #                                   when (maxv+1) % 50 == 0)
    bad = [float(i) for i in range(64)]
    bad[7] = None
    add_vec(maxv + 2, bad, 3)  # null lane
    add_vec(maxv + 3, None, 3)  # NULL vector
    nanv = [float(i) for i in range(64)]
    nanv[3] = float("nan")
    add_vec(maxv + 4, nanv, 3)  # NaN lane (floor(NaN) would smuggle a
    #                             fake score-0 out of a naive kernel;
    #                             DuckDB can't even cast NaN to BIGINT)
    infv = [float(i) for i in range(64)]
    infv[5] = float("inf")
    add_vec(maxv + 5, infv, 3)  # Inf lane
    add_vec(maxv + 6, [0.0] * 64, 3)  # zero vector: no direction, the
    #                                   0/0 cosine is undefined
    pq.write_table(
        pa.table({n: pa.array(ec[n], type=e.schema.field(n).type)
                  for n in e.schema.names}),
        f"{dst}/embeddings.parquet")
    print(f"dirty table at {dst}: docs +15 degenerate (ids {maxid + 1}.."
          f"{maxid + 15}: 2 null, empty, all-space, tab/newline-only, "
          f"trailing-tab, leading-tab, vertical-tab, astral, accented, "
          f"nbsp, U+2028, CRLF, NUL-byte, hot-repeated-token), "
          f"vectors +ragged/null-lane/null/nan-lane/inf-lane/zero "
          f"(ids {maxv + 1}..{maxv + 6})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
