"""CLIP byte-pair-encoding tokenizer (host-side, pure Python).

Functionally equivalent to the reference ``SimpleTokenizer``
(``stable_diffusion/clip_tokenizer.py:77-209``): byte<->unicode tables, ``</w>``
end-of-word BPE over a ranked merges file, the CLIP pre-tokenizer regex (including
dynamically added special tokens), BOS/EOT wrapping, decode, and ``add_tokens`` for
textual inversion placeholders.

The merges file is the standard OpenAI CLIP ``bpe_simple_vocab_16e6.txt.gz``. This
environment has no network, so the path must be supplied (``bpe_path``); there is no
auto-download (the reference fetches it via ``keras.utils.get_file``,
``clip_tokenizer.py:79-83``).
"""

from __future__ import annotations

import gzip
import html
from functools import lru_cache
from typing import Dict, List, Union

import regex as re

SOT_TOKEN = "<|startoftext|>"
EOT_TOKEN = "<|endoftext|>"
_NUM_MERGES = 49152 - 256 - 2  # vocabulary budget of the CLIP BPE


@lru_cache()
def byte_unicode_table() -> Dict[int, str]:
    """Reversible byte -> printable-unicode mapping (GPT-2/CLIP convention)."""
    printable = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    mapping = {b: chr(b) for b in printable}
    offset = 0
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(256 + offset)
            offset += 1
    return mapping


def _clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return re.sub(r"\s+", " ", text).strip()


class ClipTokenizer:
    def __init__(self, bpe_path: str):
        if bpe_path.endswith(".gz"):
            data = gzip.open(bpe_path).read().decode("utf-8")
        else:
            with open(bpe_path, encoding="utf-8") as f:
                data = f.read()
        # Line 0 is a version header. No filtering of blank lines: the reference
        # keeps them (clip_tokenizer.py:86-92), which shifts every subsequent vocab
        # id — token ids must match exactly for checkpoint compatibility.
        lines = data.split("\n")[1 : _NUM_MERGES + 1]
        merges = [tuple(line.split()) for line in lines]

        units = list(byte_unicode_table().values())
        vocab: List[str] = units + [u + "</w>" for u in units]
        vocab += ["".join(m) for m in merges]
        vocab += [SOT_TOKEN, EOT_TOKEN]
        self.vocab = vocab
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.merge_rank = {m: i for i, m in enumerate(merges)}
        self.byte_encoder = byte_unicode_table()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.special_tokens = [SOT_TOKEN, EOT_TOKEN]
        self._bpe_cache: Dict[str, str] = {t: t for t in self.special_tokens}
        self._compile_pattern()

    def _compile_pattern(self):
        specials = "|".join(re.escape(t) for t in self.special_tokens)
        self._pat = re.compile(
            specials + r"""|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )

    @property
    def start_of_text(self) -> int:
        return self.encoder[SOT_TOKEN]

    @property
    def end_of_text(self) -> int:
        return self.encoder[EOT_TOKEN]

    def add_tokens(self, tokens: Union[str, List[str]]) -> int:
        """Register new special tokens (textual-inversion placeholders). Returns the
        number actually added (reference ``clip_tokenizer.py:130-144``)."""
        if isinstance(tokens, str):
            tokens = [tokens]
        added = 0
        for tok in tokens:
            if tok in self.encoder:
                continue
            self.vocab.append(tok)
            self.encoder[tok] = len(self.vocab) - 1
            self.decoder[self.encoder[tok]] = tok
            self.special_tokens.append(tok)
            self._bpe_cache[tok] = tok
            added += 1
        if added:
            self._compile_pattern()
        return added

    def _bpe(self, token: str) -> str:
        """Greedy lowest-rank merging of ``token`` (already byte-mapped), with the
        CLIP ``</w>`` end-of-word marker."""
        cached = self._bpe_cache.get(token)
        if cached is not None:
            return cached
        if not token:
            return token
        word = list(token[:-1]) + [token[-1] + "</w>"]
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.merge_rank.get(p, float("inf")))
            if best not in self.merge_rank:
                break
            first, second = best
            merged: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
        result = " ".join(word)
        self._bpe_cache[token] = result
        return result

    def encode(self, text: str) -> List[int]:
        """Text -> [SOT, ...bpe ids..., EOT]."""
        ids = [self.start_of_text]
        text = _clean(text).lower()
        for chunk in re.findall(self._pat, text):
            if chunk in self.special_tokens and chunk in self.encoder:
                ids.append(self.encoder[chunk])
                continue
            mapped = "".join(self.byte_encoder[b] for b in chunk.encode("utf-8"))
            ids.extend(self.encoder[piece] for piece in self._bpe(mapped).split(" "))
        ids.append(self.end_of_text)
        return ids

    def decode(self, ids) -> str:
        text = "".join(self.decoder[int(i)] for i in ids)
        return (
            bytearray(self.byte_decoder[ch] for ch in text if ch in self.byte_decoder)
            .decode("utf-8", errors="replace")
            .replace("</w>", " ")
        )
