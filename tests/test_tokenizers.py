"""Golden tokenizer tests vs the canonical `tokenizers` library.

Fixtures are trained/built locally (zero-egress environment), saved as
tokenizer.json, then loaded with OUR parser — mirroring the reference's
TestCorrectness.java golden-encoding strategy.
"""

import json

import pytest

tokenizers = pytest.importorskip("tokenizers")

from jlama_tpu.tokenizers import Tokenizer, parse_tokenizer_json

CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "Hello world! It's a beautiful day; isn't it?",
    "Numbers: 1234567890 42 3.14159 -17",
    "Unicode: café naïve über straße 你好世界 😀🚀",
    "    indented    and  spaced    text\n\nwith newlines\t and tabs",
    "CamelCase snake_case kebab-case dot.case",
    "Punctuation!!! ??? ;;; ... ---",
]

PROBES = [
    "Hello world",
    "hello",
    "  leading spaces",
    "trailing spaces   ",
    "It's the fox's den... isn't it?",
    "12345 abc 6.78",
    "café über",
    "mixed 你好 ascii",
    "😀 emoji 🚀 start",
    "new\nlines\n\nand\ttabs",
    "",
    "a",
    "The quick brown fox",
]


def _roundtrip_check(ours: Tokenizer, theirs, probes, check_decode=True):
    for text in probes:
        ref = theirs.encode(text).ids
        got = ours.encode(text)
        assert got == ref, f"encode mismatch on {text!r}:\n ours={got}\n ref ={ref}"
        if check_decode and ref:
            ref_text = theirs.decode(ref)
            got_text = ours.decode(ref)
            assert got_text == ref_text, (
                f"decode mismatch on {text!r}: ours={got_text!r} ref={ref_text!r}"
            )


@pytest.fixture(scope="module")
def gpt2_style(tmp_path_factory):
    """Byte-level BPE like GPT-2."""
    from tokenizers import Tokenizer as HFTok
    from tokenizers.models import BPE
    from tokenizers.trainers import BpeTrainer
    from tokenizers import pre_tokenizers, decoders

    tok = HFTok(BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = BpeTrainer(
        vocab_size=500, special_tokens=["<|endoftext|>"], show_progress=False,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(CORPUS * 10, trainer)
    path = tmp_path_factory.mktemp("gpt2tok") / "tokenizer.json"
    tok.save(str(path))
    return tok, path


def test_byte_level_bpe_matches(gpt2_style):
    hf, path = gpt2_style
    spec = parse_tokenizer_json(json.loads(path.read_text()))
    ours = Tokenizer(spec)
    _roundtrip_check(ours, hf, PROBES)


def test_byte_level_special_tokens(gpt2_style):
    hf, path = gpt2_style
    spec = parse_tokenizer_json(json.loads(path.read_text()))
    ours = Tokenizer(spec)
    text = "Hello<|endoftext|>world"
    ref = hf.encode(text).ids
    assert ours.encode(text) == ref


@pytest.fixture(scope="module")
def sp_style(tmp_path_factory):
    """SentencePiece-style BPE (metaspace), like llama2/mistral."""
    from tokenizers import SentencePieceBPETokenizer

    tok = SentencePieceBPETokenizer()
    tok.train_from_iterator(
        CORPUS * 10, vocab_size=500, special_tokens=["<unk>", "<s>", "</s>"],
        show_progress=False,
    )
    path = tmp_path_factory.mktemp("sptok") / "tokenizer.json"
    tok.save(str(path))
    return tok, path


def test_sentencepiece_bpe_matches(sp_style):
    hf, path = sp_style
    spec = parse_tokenizer_json(json.loads(path.read_text()))
    ours = Tokenizer(spec)
    probes = [p for p in PROBES if p]
    _roundtrip_check(ours, hf, probes)


@pytest.fixture(scope="module")
def wordpiece_style(tmp_path_factory):
    from tokenizers import BertWordPieceTokenizer

    tok = BertWordPieceTokenizer(lowercase=True)
    tok.train_from_iterator(CORPUS * 10, vocab_size=500, show_progress=False)
    path = tmp_path_factory.mktemp("wptok") / "tokenizer.json"
    tok.save(str(path))
    return tok, path


def test_wordpiece_matches(wordpiece_style):
    hf, path = wordpiece_style
    spec = parse_tokenizer_json(json.loads(path.read_text()))
    ours = Tokenizer(spec)
    for text in [p for p in PROBES if p]:
        ref = hf.encode(text).ids
        got = ours.encode(text)
        assert got == ref, f"encode mismatch on {text!r}:\n ours={got}\n ref ={ref}"


def test_wordpiece_unk():
    vocab = {"[UNK]": 0, "[CLS]": 1, "[SEP]": 2, "hello": 3, "wor": 4, "##ld": 5}
    spec = parse_tokenizer_json(
        {
            "model": {
                "type": "WordPiece",
                "vocab": vocab,
                "unk_token": "[UNK]",
                "continuing_subword_prefix": "##",
            },
            "added_tokens": [
                {"id": 0, "content": "[UNK]", "special": True},
                {"id": 1, "content": "[CLS]", "special": True},
                {"id": 2, "content": "[SEP]", "special": True},
            ],
            "normalizer": {"type": "BertNormalizer", "lowercase": True},
            "post_processor": {
                "type": "TemplateProcessing",
                "single": [
                    {"SpecialToken": {"id": "[CLS]", "type_id": 0}},
                    {"Sequence": {"id": "A", "type_id": 0}},
                    {"SpecialToken": {"id": "[SEP]", "type_id": 0}},
                ],
            },
        }
    )
    ours = Tokenizer(spec)
    assert ours.encode("hello world", add_special=False) == [3, 4, 5]
    assert ours.encode("HELLO zzz", add_special=False) == [3, 0]
    assert ours.encode("hello world") == [1, 3, 4, 5, 2]
