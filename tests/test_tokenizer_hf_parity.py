"""WordPiece tokenizer fuzz parity vs HF BertTokenizer (offline, shared
vocab file).  Covers lowercase/accent-strip, punctuation splitting, greedy
longest-match with ## continuations, [UNK] fallback, special-token ids, and
fixed-length encoding."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from vqattack_tpu.text.tokenizer import WordPieceTokenizer


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    words = [
        "the", "a", "dog", "cat", "play", "##ing", "##s", "##ed", "red",
        "blue", "frisbee", "fri", "##sbee", "skate", "##board", "man",
        "wo", "##man", "run", "##ning", "!", "?", ",", ".", "'", "-",
        "2", "##0", "один",
    ]
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    path = tmp_path_factory.mktemp("tok") / "vocab.txt"
    path.write_text("\n".join(specials + words) + "\n")
    ours = WordPieceTokenizer.from_file(str(path))
    hf = transformers.BertTokenizer(str(path), do_lower_case=True)
    return ours, hf


CASES = [
    "The dog PLAYING red!",
    "a man runs, a woman skateboards.",
    "frisbee friS-BEE 20 dogs?",
    "  weird   spacing\tand\nnewlines ",
    "café résumé",  # accents strip to unknown pieces
    "unknownzzz word-with-dash 'quoted'",
    "!!!???...",
    "",
]


def test_fixed_cases(pair):
    ours, hf = pair
    for text in CASES:
        assert ours.tokenize(text) == hf.tokenize(text), text


def test_embedded_special_tokens(pair):
    """HF's added-token trie splits special tokens out of the MIDDLE of a
    word — the reference's ALBEF answer list is built as ``answer+'[SEP]'``
    with no space (answer-encoding path), so this must match exactly."""
    ours, hf = pair
    for text in ["dog[SEP]", "red[SEP] blue[SEP]", "cat[MASK]dog",
                 "[CLS]dog", "a[SEP]"]:
        assert ours.tokenize(text) == hf.tokenize(text), text


def test_fuzz_parity(pair):
    ours, hf = pair
    rng = np.random.default_rng(0)
    pieces = ["dog", "cat", "playing", "plays", "played", "frisbee", "man",
              "woman", "running", "red", "blue", "a", "the", "2", "20",
              "zzz", "Dog!", "cat?", "RED,", "skateBoard", "fri-sbee", "'s"]
    for _ in range(200):
        n = rng.integers(1, 10)
        text = " ".join(rng.choice(pieces, size=n))
        assert ours.tokenize(text) == hf.tokenize(text), text


def test_encode_matches_hf(pair):
    ours, hf = pair
    text = "the dog playing red"
    ids, mask = ours.encode(text, max_length=12)
    ref = hf(text, padding="max_length", truncation=True, max_length=12)
    np.testing.assert_array_equal(ids, ref["input_ids"])
    np.testing.assert_array_equal(mask, ref["attention_mask"])
    # special ids resolved identically
    assert ours.cls_token_id == hf.cls_token_id
    assert ours.sep_token_id == hf.sep_token_id
    assert ours.mask_token_id == hf.mask_token_id
    assert ours.pad_token_id == hf.pad_token_id


def test_convert_tokens_to_string_matches(pair):
    ours, hf = pair
    toks = ["play", "##ing", "the", "fri", "##sbee"]
    assert ours.convert_tokens_to_string(toks) == hf.convert_tokens_to_string(toks)
