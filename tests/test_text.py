"""Tokenizer, label-parser, and text-cache tests."""

import numpy as np

from lseg_tpu.data.labels import parse_label_list, parse_object_info
from lseg_tpu.testing import TINY_TEXT
from lseg_tpu.text.tokenizer import ClipBPETokenizer, byte_unicode_table


def test_byte_table_reversible():
    tab = byte_unicode_table()
    assert len(tab) == 256
    assert len(set(tab.values())) == 256
    assert tab[ord("a")] == "a"


def test_bpe_merges_applied():
    tok = ClipBPETokenizer.for_tests()
    # 'cat' -> merges (c,a)->ca, (ca,t</w>)->cat</w> => single token
    ids = tok.encode("cat")
    assert len(ids) == 1
    assert tok.decoder[ids[0]] == "cat</w>"
    # 'dog' similarly
    assert len(tok.encode("dog")) == 1
    # unknown word splits into pieces but round-trips through decode
    assert tok.decode(tok.encode("zebra crossing")) == "zebra crossing"


def test_tokenize_layout():
    tok = ClipBPETokenizer.for_tests(context_length=8)
    arr = tok(["cat", "dog"])
    assert arr.shape == (2, 8)
    assert arr.dtype == np.int32
    assert (arr[:, 0] == tok.sot).all()
    assert arr[0, 2] == tok.eot  # sot, cat, eot
    assert (arr[0, 3:] == 0).all()
    # eot position = argmax of ids (eot is the largest id) — the property
    # CLIPTextEncoder relies on to pick the EOT activation
    assert arr[0].argmax() == 2


def test_tokenize_truncation_keeps_eot():
    tok = ClipBPETokenizer.for_tests(context_length=6)
    arr = tok(["the cat and the dog and the other"])
    assert arr.shape == (1, 6)
    assert arr[0, -1] == tok.eot


def test_clean_lowercases_and_collapses():
    tok = ClipBPETokenizer.for_tests()
    assert tok.encode("  CaT \n") == tok.encode("cat")


def test_clean_fixes_mojibake():
    """_fix_mojibake repairs UTF-8-as-cp1252/latin-1 mis-decodes
    (single and double encoded) and leaves genuine text untouched —
    the ftfy.fix_text stage of the reference's basic_clean."""
    from lseg_tpu.text.tokenizer import _fix_mojibake

    assert _fix_mojibake("cafÃ©") == "café"
    assert _fix_mojibake("naÃ¯ve dog") == "naïve dog"
    # double-encoded: é -> 'Ã©' -> 'ÃƒÂ©'
    assert _fix_mojibake("cafÃƒÂ©") == "café"
    # genuine text passes through: accents, CJK, ASCII, lone symbols
    for s in ("café", "naïve", "犬", "plain ascii", "©", "±5°C"):
        assert _fix_mojibake(s) == s
    # and the tokenizer consumes the repaired form
    tok = ClipBPETokenizer.for_tests()
    assert tok.encode("cÃ¡t") == tok.encode("cát")


def test_label_parsers(tmp_path):
    p = tmp_path / "obj.txt"
    p.write_text(
        "Idx,Ratio,Train,Val,Stuff,Name\n"
        "1,0.1,1,1,1,wall\n"
        "2,0.1,1,1,1,building;edifice\n"
    )
    assert parse_object_info(str(p)) == ["wall", "building"]
    q = tmp_path / "fewshot.txt"
    q.write_text("aeroplane\nbicycle\n\n")
    assert parse_label_list(str(q)) == ["aeroplane", "bicycle"]


def test_reference_label_files_parse():
    # The real label files ship with the reference; parse them for parity.
    import os

    ref = "/root/reference/label_files"
    if not os.path.isdir(ref):
        import pytest

        pytest.skip("reference not mounted")
    labels = parse_object_info(os.path.join(ref, "ade20k_objectInfo150.txt"))
    assert len(labels) == 150
    assert labels[0] == "wall"
    assert labels[1] == "building"
    pascal = parse_label_list(os.path.join(ref, "fewshot_pascal.txt"))
    assert len(pascal) == 20
    assert pascal[0] == "aeroplane"


def test_text_cache_hits_and_shapes():
    import jax

    from lseg_tpu.models.clip_text import CLIPTextEncoder
    from lseg_tpu.text.cache import TextFeatureCache

    tok = ClipBPETokenizer.for_tests(context_length=TINY_TEXT.context_length)
    enc = CLIPTextEncoder(TINY_TEXT)
    variables = enc.init(
        jax.random.PRNGKey(0), np.zeros((1, 16), np.int32)
    )
    cache = TextFeatureCache(TINY_TEXT, variables, tok)
    f1 = cache(("cat", "dog", "other"))
    assert f1.shape == (3, TINY_TEXT.embed_dim)
    f2 = cache(("cat", "dog", "other"))
    assert f1 is f2  # cache hit returns the same array
    pair = cache.pair_features("cat")
    assert pair.shape == (2, TINY_TEXT.embed_dim)


def test_logger(tmp_path):
    from lseg_tpu.utils.logging import Logger

    lg = Logger(str(tmp_path), name="t")
    lg.info("hello")
    saved = []
    assert lg.save_model_miou(lambda p: saved.append(p), 0, 50.0)
    assert not lg.save_model_miou(lambda p: saved.append(p), 1, 40.0)
    assert lg.save_model_miou(lambda p: saved.append(p), 2, 60.0)
    assert len(saved) == 2
    log = (tmp_path / "t" / "log.txt").read_text()
    assert "hello" in log
    assert Logger.count_params({"a": np.zeros((2, 3)),
                                "b": {"c": np.zeros(5)}}) == 11


def test_packaged_labels():
    from lseg_tpu.data.labels import get_labels

    assert len(get_labels("ade20k")) == 150
    assert get_labels("ade20k")[0] == "wall"
    assert len(get_labels("pascal")) == 20
    assert len(get_labels("coco")) == 80
    assert len(get_labels("fss")) == 1000
