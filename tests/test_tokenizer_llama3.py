"""Llama-3-style tokenizer: Split-regex + ByteLevel(use_regex=False) + ignore_merges."""

import json

import pytest

tokenizers = pytest.importorskip("tokenizers")

from jlama_tpu.tokenizers import Tokenizer, parse_tokenizer_json

LLAMA3_PATTERN = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}"
    r"| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)


@pytest.fixture(scope="module")
def llama3_style(tmp_path_factory):
    from tokenizers import Tokenizer as HFTok, Regex
    from tokenizers.models import BPE
    from tokenizers import pre_tokenizers, decoders
    from tokenizers.trainers import BpeTrainer

    tok = HFTok(BPE(unk_token=None, ignore_merges=True))
    tok.pre_tokenizer = pre_tokenizers.Sequence(
        [
            pre_tokenizers.Split(pattern=Regex(LLAMA3_PATTERN), behavior="isolated"),
            pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
        ]
    )
    tok.decoder = decoders.ByteLevel()
    trainer = BpeTrainer(
        vocab_size=600,
        show_progress=False,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        special_tokens=["<|begin_of_text|>", "<|eot_id|>"],
    )
    corpus = [
        "The quick brown fox jumps over the lazy dog. It's 12345!",
        "Hello world,\nnew lines\r\nand  spaces   everywhere 678 90",
        "café über 你好 😀 punctuation!!! (parens) [brackets]",
    ]
    tok.train_from_iterator(corpus * 20, trainer)
    path = tmp_path_factory.mktemp("l3tok") / "tokenizer.json"
    tok.save(str(path))
    return tok, path


PROBES = [
    "Hello world, it's 12345!",
    "numbers 1234567 split into threes",
    "\n\nleading newlines",
    "tabs\tand\r\nCRLF",
    "UPPER'S lower's",
    "a  b   c    d",
    "你好 world café",
    "😀🚀",
    "trailing space ",
    "<|begin_of_text|>Hello<|eot_id|>",
]


def test_llama3_style_matches(llama3_style):
    hf, path = llama3_style
    spec = parse_tokenizer_json(json.loads(path.read_text()))
    ours = Tokenizer(spec)
    for text in PROBES:
        ref = hf.encode(text).ids
        got = ours.encode(text)
        assert got == ref, f"encode mismatch on {text!r}:\n ours={got}\n ref ={ref}"
        assert ours.decode(ref) == hf.decode(ref)
