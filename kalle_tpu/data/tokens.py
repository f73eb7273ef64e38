"""Special-token table + tokenizer front.

The reference registers 8 audio special tokens on top of Llama-3's 128256
vocab (ref: twj_dataset.py:155-162, twj_dataset_offline.py:187-194) and packs
prompts as `text_ids + [SPEECH_UNDERSTANDING_END, SPEECH_GENERATION_START]`
(ref: twj_dataset_offline.py:288-289, infer_vibevoice.py:350-353).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

LLAMA3_BASE_VOCAB = 128256

SPECIAL_TOKENS = (
    "<|TEXT_GENERATION_START|>",      # 128256
    "<|TEXT_GENERATION_END|>",        # 128257
    "<|TEXT_UNDERSTANDING_START|>",   # 128258
    "<|TEXT_UNDERSTANDING_END|>",     # 128259
    "<|SPEECH_GENERATION_START|>",    # 128260
    "<|SPEECH_GENERATION_END|>",      # 128261
    "<|SPEECH_UNDERSTANDING_START|>", # 128262
    "<|SPEECH_UNDERSTANDING_END|>",   # 128263
)


@dataclass(frozen=True)
class SpecialIds:
    text_generation_start: int = 128256
    text_generation_end: int = 128257
    text_understanding_start: int = 128258
    text_understanding_end: int = 128259
    speech_generation_start: int = 128260
    speech_generation_end: int = 128261
    speech_understanding_start: int = 128262
    speech_understanding_end: int = 128263

    @staticmethod
    def from_base(base_vocab: int) -> "SpecialIds":
        return SpecialIds(*(base_vocab + i for i in range(8)))


class ByteTokenizer:
    """Byte-level fallback tokenizer for environments without the Llama
    tokenizer files (tests, air-gapped hosts). ids 0-255 are raw bytes,
    256 = pad, specials live at base_vocab..base_vocab+7."""

    def __init__(self, base_vocab: int = 257):
        self.base_vocab = base_vocab
        self.pad_token_id = 256
        self.special = SpecialIds.from_base(base_vocab)
        self.vocab_size = base_vocab + 8

    def __len__(self) -> int:
        return self.vocab_size

    def encode(self, text: str) -> List[int]:
        return list(text.encode("utf-8"))

    def decode(self, ids: Sequence[int]) -> str:
        return bytes(i for i in ids if 0 <= i < 256).decode("utf-8", errors="replace")

    def convert_tokens_to_ids(self, token: str) -> int:
        idx = SPECIAL_TOKENS.index(token)
        return self.base_vocab + idx

    def encode_with_specials(self, text: str) -> List[int]:
        """Encode with the 8 audio special tokens mapped to their ids;
        everything else (incl. chat-layout markers) as raw bytes."""
        ids: List[int] = []
        i, n = 0, len(text)
        while i < n:
            for tok in SPECIAL_TOKENS:
                if text.startswith(tok, i):
                    ids.append(self.convert_tokens_to_ids(tok))
                    i += len(tok)
                    break
            else:
                ids.extend(text[i].encode("utf-8"))
                i += 1
        return ids

    def apply_chat_template(self, messages: Sequence[dict]) -> List[int]:
        return self.encode_with_specials(_llama3_chat_render(messages))


class HFTokenizer:
    """Wraps a local HuggingFace tokenizer dir (the reference's
    `tokenizer_path`, ref: configs/twj.yaml:14). Adds the 8 special tokens
    if absent so ids land at 128256..128263."""

    def __init__(self, path: str):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(path)
        missing = [t for t in SPECIAL_TOKENS
                   if self.tok.convert_tokens_to_ids(t) is None
                   or self.tok.convert_tokens_to_ids(t) == self.tok.unk_token_id]
        if missing:
            self.tok.add_special_tokens({"additional_special_tokens": list(missing)})
        if self.tok.pad_token_id is None:
            self.tok.pad_token = self.tok.eos_token
        self.pad_token_id = self.tok.pad_token_id
        self.special = SpecialIds(
            *(self.tok.convert_tokens_to_ids(t) for t in SPECIAL_TOKENS)
        )
        self.vocab_size = len(self.tok)

    def __len__(self) -> int:
        return self.vocab_size

    def encode(self, text: str) -> List[int]:
        return self.tok.encode(text)

    def decode(self, ids: Sequence[int]) -> str:
        return self.tok.decode(ids)

    def convert_tokens_to_ids(self, token: str) -> int:
        return self.tok.convert_tokens_to_ids(token)

    def apply_chat_template(self, messages: Sequence[dict]) -> List[int]:
        if getattr(self.tok, "chat_template", None):
            return list(self.tok.apply_chat_template(messages, tokenize=True))
        # template-less tokenizer dir: render the Llama-3 layout ourselves
        return self.tok.encode(_llama3_chat_render(messages),
                               add_special_tokens=False)


def build_tokenizer(path: Optional[str] = None):
    if path:
        return HFTokenizer(path)
    return ByteTokenizer()


def build_prompt_ids(tokenizer, text: str) -> List[int]:
    """text ids + [SPEECH_UNDERSTANDING_END, SPEECH_GENERATION_START]
    (ref: twj_dataset_offline.py:288-289)."""
    sp = tokenizer.special
    return list(tokenizer.encode(text)) + [
        sp.speech_understanding_end,
        sp.speech_generation_start,
    ]


# Chat-template prompting (ref tools/batch_infer.py:72-77): the caption is
# wrapped in a user turn `Convert the text to speech:<|TEXT_UNDERSTANDING_
# START|>{text}<|SPEECH_UNDERSTANDING_END|>` and the assistant turn opens
# with <|SPEECH_GENERATION_START|>, run through the tokenizer's chat
# template.
CHAT_USER_CONTENT = ("Convert the text to speech:"
                     "<|TEXT_UNDERSTANDING_START|>{text}"
                     "<|SPEECH_UNDERSTANDING_END|>")
CHAT_ASSISTANT_CONTENT = "<|SPEECH_GENERATION_START|>"


def build_chat_messages(text: str) -> List[dict]:
    return [
        {"role": "user", "content": CHAT_USER_CONTENT.format(text=text)},
        {"role": "assistant", "content": CHAT_ASSISTANT_CONTENT},
    ]


def build_chat_prompt_ids(tokenizer, text: str) -> List[int]:
    """Chat-template prompt ids, exactly `tokenizer.apply_chat_template(
    chat, tokenize=True)` from ref tools/batch_infer.py:72-77. Tokenizers
    without a chat template (ByteTokenizer, template-less HF dirs) get the
    Llama-3 chat layout rendered manually so the stream structure matches."""
    return list(tokenizer.apply_chat_template(build_chat_messages(text)))


def _llama3_chat_render(messages: Sequence[dict]) -> str:
    """Llama-3 chat layout (header markers + eot per message), used when the
    tokenizer ships no template of its own."""
    parts = ["<|begin_of_text|>"]
    for m in messages:
        parts.append(f"<|start_header_id|>{m['role']}<|end_header_id|>\n\n"
                     f"{m['content']}<|eot_id|>")
    return "".join(parts)
