"""Chat-template prompting (ref tools/batch_infer.py:72-77).

The reference wraps the caption in a user turn and opens the assistant turn
with <|SPEECH_GENERATION_START|>, tokenized through
`tokenizer.apply_chat_template(chat, tokenize=True)`. These tests compare
token streams between build_chat_prompt_ids and a direct template
application, and check the structural invariants of the prompt."""
from kalle_tpu.data.tokens import (
    CHAT_ASSISTANT_CONTENT,
    CHAT_USER_CONTENT,
    ByteTokenizer,
    build_chat_messages,
    build_chat_prompt_ids,
    build_prompt_ids,
    build_tokenizer,
)


def test_chat_messages_shape():
    msgs = build_chat_messages("hello")
    assert [m["role"] for m in msgs] == ["user", "assistant"]
    assert msgs[0]["content"] == CHAT_USER_CONTENT.format(text="hello")
    assert msgs[1]["content"] == CHAT_ASSISTANT_CONTENT
    assert "<|TEXT_UNDERSTANDING_START|>" in msgs[0]["content"]
    assert "<|SPEECH_UNDERSTANDING_END|>" in msgs[0]["content"]


def test_chat_prompt_ids_match_template_stream():
    tok = ByteTokenizer()
    ids = build_chat_prompt_ids(tok, "hi")
    # exactly the tokenizer's own template application (token-stream parity)
    assert ids == list(tok.apply_chat_template(build_chat_messages("hi")))
    sp = tok.special
    # the audio specials appear as SINGLE ids, in reference order
    specials = [i for i in ids if i >= tok.base_vocab]
    assert specials == [sp.text_understanding_start,
                       sp.speech_understanding_end,
                       sp.speech_generation_start]
    # caption bytes sit between TEXT_UNDERSTANDING_START and
    # SPEECH_UNDERSTANDING_END
    a = ids.index(sp.text_understanding_start)
    b = ids.index(sp.speech_understanding_end)
    assert bytes(ids[a + 1:b]).decode() == "hi"


def test_chat_prompt_differs_from_raw_prompt():
    tok = ByteTokenizer()
    raw = build_prompt_ids(tok, "hi")
    chat = build_chat_prompt_ids(tok, "hi")
    assert raw != chat
    # raw prompt ENDS with the generation-start token; the chat prompt has
    # template content (eot) after it, matching the reference's
    # apply_chat_template behavior with a full assistant message
    sp = tok.special
    assert raw[-1] == sp.speech_generation_start
    assert sp.speech_generation_start in chat
    assert chat[-1] != sp.speech_generation_start


def test_hf_tokenizer_uses_chat_template(tmp_path):
    """HFTokenizer delegates to the tokenizer's own chat template when one
    exists; stream must equal the direct apply_chat_template call."""
    import pytest

    transformers = pytest.importorskip("transformers")
    from transformers import GPT2Tokenizer

    # build a tiny local vocab (GPT2Tokenizer loads from local files only)
    import json

    vocab = {chr(c): i for i, c in enumerate(range(32, 127))}
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    tok = GPT2Tokenizer.from_pretrained(str(tmp_path))
    tok.chat_template = (
        "{% for m in messages %}[{{ m.role }}]{{ m.content }}{% endfor %}")
    tok.save_pretrained(str(tmp_path))

    from kalle_tpu.data.tokens import HFTokenizer

    wrapped = HFTokenizer(str(tmp_path))
    ids = build_chat_prompt_ids(wrapped, "hey")
    direct = wrapped.tok.apply_chat_template(
        build_chat_messages("hey"), tokenize=True)
    assert ids == list(direct)
