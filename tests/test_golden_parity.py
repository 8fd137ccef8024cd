"""Golden-file parity: replay the reference's committed outputs through
this engine's text sink.

The reference ships five end-to-end goldens
(``/root/reference/sample_test_case_{1..4}_final_*.txt``, ``final_wc.txt``
-- its ONLY test artifacts, SURVEY §5) but not the Project Gutenberg
input books, so the queries cannot be re-run from source.  What CAN be
pinned is sink parity: parse each golden, render the parsed rows back
through ``reference_text_sink`` + ``write_reference_text``, and assert
the normalized multisets match.  Normalization implements SURVEY §4
defects 7-8 exactly:

* defect 7 -- the last group per reduce partition is flushed WITHOUT
  brackets (``MapReduce.py:158-159``): exactly ``reduce_num`` bare lines
  per golden.  Normalized by accepting both bracketed and bare values.
* defect 8 -- row order and id-map key order follow Python's salted
  ``hash()`` (``MapReduce.py:112``): nondeterministic across runs.
  Normalized by multiset comparison on rows and sorted-key comparison on
  map values.
"""

from __future__ import annotations

import ast
import re

import pytest

from mapreduce_on_google_cloud_platform_spark.operators.wordcount import (
    reference_text_sink,
)
from mapreduce_on_google_cloud_platform_spark.sources.text_io import (
    write_reference_text,
)

REF = "/root/reference"

# (file, kind, expected_rows, reduce_num) -- rows/reduce_num from the
# reference's test matrix (test_config_{1..4}.py + config.py; SURVEY §5).
GOLDENS = [
    ("sample_test_case_1_final_wc.txt", "wc", 5_324, 45),
    ("sample_test_case_2_final_wc.txt", "wc", 7_650, 50),
    ("sample_test_case_3_final_id.txt", "id", 9_687, 50),
    ("sample_test_case_4_final_id.txt", "id", 7_960, 50),
    ("final_wc.txt", "wc", 4_477, 50),
]

_LINE = re.compile(r"^(?P<word>\S*) - (?P<value>.*)$")


def _parse_golden(path: str, kind: str):
    """-> (rows, n_bare): rows are (word, canonical_value_str); values are
    canonicalized (brackets stripped, id-maps re-rendered with sorted
    keys) so both defects normalize away."""
    rows, n_bare = [], 0
    # goldens carry raw book bytes that are not valid UTF-8 (the reference
    # wrote words without re-encoding); latin-1 is a lossless byte->str map
    with open(path, encoding="latin-1") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            m = _LINE.match(line)
            assert m, f"unparseable golden line in {path}: {line!r}"
            word, value = m.group("word"), m.group("value")
            if value.startswith("[") and value.endswith("]"):
                value = value[1:-1]
            else:
                n_bare += 1  # defect-7 bare flush line
            if kind == "id":
                postings = ast.literal_eval(value)
                assert isinstance(postings, dict) and postings
                value = repr(dict(sorted(postings.items())))
            else:
                value = str(int(value))
            rows.append((word, value))
    return rows, n_bare


@pytest.mark.parametrize("fname,kind,n_rows,reduce_num", GOLDENS)
def test_golden_roundtrip_through_sink(spark, tmp_path, fname, kind, n_rows, reduce_num):
    golden, n_bare = _parse_golden(f"{REF}/{fname}", kind)
    assert len(golden) == n_rows  # matrix row counts hold
    # defect 7: one bare flush per reduce partition, never more; fewer
    # only if a partition got no groups (not observed in the goldens)
    assert n_bare == reduce_num

    df = spark.createDataFrame(golden, "word string, value string")
    out = tmp_path / f"sink_{fname}"
    write_reference_text(reference_text_sink(df), str(out))

    got = []
    for r in spark.read.text(str(out)).collect():
        m = _LINE.match(r.value)
        assert m, f"sink produced unparseable line: {r.value!r}"
        v = m.group("value")
        assert v.startswith("[") and v.endswith("]")  # quirk NOT reproduced
        got.append((m.group("word"), v[1:-1]))

    # defect 8: order-insensitive multiset equality
    assert sorted(got) == sorted(golden)


def test_goldens_pin_unicode_tokenizer_edge():
    """The reference's cleaner ``re.sub(r'[\\W_]+', '')`` is
    unicode-aware: accented letters SURVIVE (``à``, ``protégé`` appear in
    ``final_wc.txt``).  Pin that the goldens really exercise that edge,
    and that the id goldens carry per-doc postings -- the two behaviors
    FIXTURES §1 requires synthetic fixtures to reproduce."""
    wc, _ = _parse_golden(f"{REF}/final_wc.txt", "wc")
    words = {w for w, _ in wc}
    assert "à" in words and "protégé" in words
    id3, _ = _parse_golden(f"{REF}/sample_test_case_3_final_id.txt", "id")
    assert any("ChristmasCarol.txt" in v for _, v in id3)
