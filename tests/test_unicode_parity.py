"""Adversarial-unicode DuckDB parity for the string-folding text ops.

Python ``str.lower()`` and DuckDB's ICU ``lower()`` disagree on
locale-special characters (Turkish dotted I -> 'i' + combining dot in
Python but plain 'i' in DuckDB; Greek final sigma likewise), which
silently breaks value-exact parity for any op comparing lowered
strings.  The repo's contract is therefore an ASCII-only case fold
(textstats.ascii_fold == SQL translate A-Z -> a-z) — this module pins
that agreement, plus null-text and exotic-whitespace handling, on a
corpus the synthetic testdata cannot cover."""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEXTS = [
    "École ÉCOLE école mixed CASE Case",
    "İstanbul İSTANBUL istanbul",  # Turkish dotted I
    "straße STRASSE Straße",  # sharp s
    "ΣΊΣΥΦΟΣ σίσυφος Σίσυφος",  # Greek final sigma
    "a b c d e\x0bf",  # nbsp / thin space / \x0b
    "ｆｕｌｌｗｉｄｔｈ ＴＥＸＴ ｆｕｌｌｗｉｄｔｈ",
    "🎉 emoji 🎉 emoji mixed",
    "ＡＢＣ ABC ａｂｃ abc",
    None,
    "",
    "the quick THE Quick the",
]


def _corpus(tmp_path):
    path = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(1, len(TEXTS) + 1), type=pa.int64()),
                "text": pa.array(TEXTS, type=pa.string()),
            }
        ),
        path,
    )
    return path


def _con(path):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT doc_id, text FROM read_parquet('{path}')"
    )
    return con


def _assert_frames(a, b, keys):
    import pandas as pd

    a = a.sort_values(keys).reset_index(drop=True)
    b = b[list(a.columns)].sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


class TestUnicodeParity:
    def test_tfidf(self, ray_session, tmp_path):
        from deduce_ray.oracles import tfidf_sql
        from deduce_ray.ops.vectorize import tfidf_terms

        path = _corpus(tmp_path)
        got = tfidf_terms(
            ray.data.read_parquet(path), vocab_size=32
        ).to_pandas()
        _assert_frames(
            got, _con(path).execute(tfidf_sql(vocab_size=32)).df(),
            ["doc_id", "term"],
        )

    def test_top_terms(self, ray_session, tmp_path):
        import __ray_entry__ as entrymod

        from deduce_ray.ops.textstats import top_terms

        path = _corpus(tmp_path)
        got = top_terms(ray.data.read_parquet(path)).to_pandas()
        _assert_frames(
            got,
            _con(path).execute(entrymod.oracle_sql()["top_terms"]).df(),
            ["n", "term"],
        )

    def test_doc_langid(self, ray_session, tmp_path):
        from deduce_ray.oracles import doc_langid_sql
        from deduce_ray.ops.agg import grouped_agg
        from deduce_ray.ops.textstats import langid_batch

        path = _corpus(tmp_path)
        per = ray.data.read_parquet(path).map_batches(
            langid_batch, batch_format="pyarrow"
        )
        got = grouped_agg(
            per, keys=["predicted_lang"], aggs={"n_docs": (None, "count")}
        ).to_pandas()
        _assert_frames(
            got, _con(path).execute(doc_langid_sql()).df(),
            ["predicted_lang"],
        )

    def test_lm_and_repetition(self, ray_session, tmp_path):
        from deduce_ray.oracles import lm_perplexity_sql, repetition_sql
        from deduce_ray.ops.lm import lm_perplexity
        from deduce_ray.ops.textstats import repetition_batch

        path = _corpus(tmp_path)
        ds = ray.data.read_parquet(path)
        con = _con(path)
        _assert_frames(
            lm_perplexity(ds).to_pandas(),
            con.execute(lm_perplexity_sql()).df(),
            ["doc_id"],
        )
        _assert_frames(
            ds.map_batches(repetition_batch, batch_format="pyarrow")
            .to_pandas(),
            con.execute(repetition_sql()).df(),
            ["doc_id"],
        )

    def test_ascii_fold_is_the_contract(self):
        from deduce_ray.ops.textstats import ascii_fold

        assert ascii_fold("İΣA z") == "İΣa z"  # non-ASCII untouched
        assert ascii_fold("ABC") == "abc"


class TestUnicodeFoldMode:
    """Opt-in ``casefold="unicode"`` (ICU parity): the fold contract is
    DuckDB's built-in lower(), mirrored per codepoint by
    textstats.unicode_fold — Turkish dotted-I and final-sigma corpora
    pass BOTH sides, which the default ASCII contract deliberately does
    not attempt."""

    def test_unicode_fold_function(self):
        from deduce_ray.ops.textstats import resolve_fold, unicode_fold

        # Turkish dotted I: simple mapping 'i' (NOT 'i' + combining dot)
        assert unicode_fold("İSTANBUL") == "istanbul"
        # final sigma: per-codepoint mapping is always U+03C3
        assert unicode_fold("ΣΟΦΟΣ") == "σοφοσ"
        # sharp s stays (lower of ß is ß; no casefold-style 'ss')
        assert unicode_fold("STRAßE") == "straße"
        assert unicode_fold("ＡＢＣ") == "ａｂｃ"  # fullwidth
        # ASCII agrees with ascii_fold byte for byte
        assert unicode_fold("MiXeD ascii 123") == "mixed ascii 123"
        assert resolve_fold("unicode") is unicode_fold
        import pytest

        with pytest.raises(ValueError):
            resolve_fold("turkish")

    def test_fold_matches_duckdb_lower_exhaustively(self):
        """Per-codepoint agreement with DuckDB lower() over every
        assigned codepoint in the blocks the corpus languages use
        (Latin, Greek, Cyrillic, fullwidth, Deseret) — the contract's
        ground truth."""
        import duckdb
        import unicodedata

        from deduce_ray.ops.textstats import unicode_fold

        chars = []
        for rng in ((0x20, 0x590), (0x1E00, 0x2C80), (0xFF00, 0xFFF0),
                    (0x10400, 0x10450)):
            for cp in range(*rng):
                try:
                    unicodedata.name(chr(cp))
                except ValueError:
                    continue
                chars.append(chr(cp))
        con = duckdb.connect()
        con.register("t", pa.table({"c": chars}))
        for c, low in con.execute("SELECT c, lower(c) FROM t").fetchall():
            assert unicode_fold(c) == low, hex(ord(c))

    def test_top_terms_unicode_mode(self, ray_session, tmp_path):
        from deduce_ray.oracles import sql_fold
        from deduce_ray.ops.textstats import top_terms

        path = _corpus(tmp_path)
        got = top_terms(
            ray.data.read_parquet(path), casefold="unicode"
        ).to_pandas()
        want = _con(path).execute(f"""
            WITH w AS (
              SELECT unnest(list_transform(
                       regexp_extract_all(coalesce(text, ''),
                                          '[^ \t\n\r\f\x0b]+'),
                       x -> {sql_fold("unicode").format('x')})) AS term
              FROM documents
            )
            SELECT term, CAST(COUNT(*) AS BIGINT) AS n
            FROM w GROUP BY term
            ORDER BY n DESC, term LIMIT 100
        """).df()
        _assert_frames(got, want, ["n", "term"])
        # the mode genuinely folds: İstanbul + İSTANBUL + istanbul merge
        # into one 'istanbul' term (the ASCII contract keeps them apart)
        merged = got.set_index("term")["n"]
        assert merged.get("istanbul", 0) == 3

    def test_tfidf_unicode_mode(self, ray_session, tmp_path):
        from deduce_ray.oracles import tfidf_sql
        from deduce_ray.ops.vectorize import tfidf_terms

        path = _corpus(tmp_path)
        got = tfidf_terms(
            ray.data.read_parquet(path), vocab_size=32, casefold="unicode"
        ).to_pandas()
        _assert_frames(
            got,
            _con(path).execute(
                tfidf_sql(vocab_size=32, casefold="unicode")
            ).df(),
            ["doc_id", "term"],
        )

    def test_langid_unicode_mode(self, ray_session, tmp_path):
        """Fullwidth ＴＨＥ folds to 'ｔｈｅ' (still not an ASCII
        stopword), but Latin capitals with diacritics now fold — the
        mode changes matching without crashing; parity vs a direct
        Python fold check."""
        from deduce_ray.ops.textstats import langid_batch, predict_lang

        assert predict_lang("THE QUICK THE IS IN", casefold="unicode") == "en"
        path = _corpus(tmp_path)
        out = ray.data.read_parquet(path).map_batches(
            lambda b: langid_batch(b, casefold="unicode"),
            batch_format="pyarrow",
        ).to_pandas()
        assert len(out) == len(TEXTS)
