"""BERT embedding path: wordpiece alignment + embedder (offline tiny BERT)."""

import numpy as np
import pytest
import torch

from icd_tpu.models.bert_embed import (
    BertCaptionEmbedder, align_pieces_to_words, piece_word_segments)
from icd_tpu.vocabulary import (
    END_TOKEN, PAD_TOKEN, START_TOKEN, UNK_TOKEN, Vocabulary)

WORDPIECES = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]",
    "a", "man", "rid", "##ing", "horse", "on", "the", "beach", ".",
    "<", "start", "end", "pad", "unk", ">", "dog", "runs",
]


@pytest.fixture(scope="module")
def tiny_bert(tmp_path_factory):
    from transformers import BertConfig, BertModel, BertTokenizer

    vocab_path = tmp_path_factory.mktemp("bertvocab") / "vocab.txt"
    vocab_path.write_text("\n".join(WORDPIECES))
    tokenizer = BertTokenizer(str(vocab_path), do_lower_case=True)
    torch.manual_seed(0)
    config = BertConfig(
        vocab_size=len(WORDPIECES), hidden_size=16,
        num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=32, max_position_embeddings=64)
    model = BertModel(config).eval()
    return model, tokenizer


@pytest.fixture(scope="module")
def caption_vocab():
    v = Vocabulary()
    v.add_word(PAD_TOKEN)
    for w in ["a", "man", "riding", "horse", "on", "the", "beach", "."]:
        v.add_word(w)
    v.add_word(START_TOKEN)
    v.add_word(END_TOKEN)
    v.add_word(UNK_TOKEN)
    return v


def test_align_sums_pieces():
    pieces = ["[CLS]", "a", "rid", "##ing", "horse"]
    embs = np.arange(5, dtype=np.float32)[:, None] * np.ones((5, 3), np.float32)
    words = ["[CLS]", "a", "riding", "horse"]
    out = align_pieces_to_words(words, pieces, embs)
    assert out.shape == (4, 3)
    np.testing.assert_array_equal(out[0], embs[0])  # [CLS] kept as row 0
    np.testing.assert_array_equal(out[2], embs[2] + embs[3])  # summed pieces
    np.testing.assert_array_equal(out[3], embs[4])


def test_piece_word_segments_matches_align():
    """The index-only walk must reproduce align_pieces_to_words exactly:
    summing embeddings by segment id == the sequential accumulation,
    including [UNK] breaks, words with no pieces, and unconsumed tail
    pieces."""
    cases = [
        (["[CLS]", "a", "rid", "##ing", "horse"],
         ["[CLS]", "a", "riding", "horse"]),
        # [UNK] breaks the accumulation mid-word.
        (["[CLS]", "[UNK]", "beach"],
         ["[CLS]", "zzz", "beach"]),
        # Pieces run out early -> trailing words get zero rows.
        (["[CLS]", "a"],
         ["[CLS]", "a", "man", "horse"]),
        # Tail pieces no word consumes -> seg -1, excluded from sums.
        (["[CLS]", "a", "man", "runs"],
         ["[CLS]", "a"]),
    ]
    rng = np.random.default_rng(7)
    for pieces, words in cases:
        embs = rng.normal(size=(len(pieces), 4)).astype(np.float32)
        expected = align_pieces_to_words(words, pieces, embs)
        seg = piece_word_segments(words, pieces)
        assert seg.shape == (len(pieces),)
        got = np.zeros((len(words), 4), np.float32)
        for j, w in enumerate(seg):
            if w >= 0:
                got[w] += embs[j]
        np.testing.assert_allclose(got, expected, atol=1e-6)


def test_embedder_shape_and_alignment(tiny_bert, caption_vocab):
    model, tokenizer = tiny_bert
    v = caption_vocab
    captions = np.asarray([
        [v("<start>"), v("a"), v("man"), v("riding"), v("<end>")],
        [v("<start>"), v("the"), v("horse"), v("."), v("<end>")],
    ], np.int32)
    embedder = BertCaptionEmbedder(v, model=model, tokenizer=tokenizer)
    out = embedder(captions)
    # Reference layout: (B, T+1, D), row 0 = [CLS] (attention.py:190-196).
    assert out.shape == (2, 6, 16)

    # Manual expectation for caption 0: tokenize, forward, sum pieces.
    text = "[CLS] <start> a man riding <end>"
    pieces = tokenizer.tokenize(text)
    ids = torch.tensor([tokenizer.convert_tokens_to_ids(pieces)])
    with torch.no_grad():
        hidden = model(input_ids=ids).last_hidden_state[0].numpy()
    expected = align_pieces_to_words(text.split(), pieces, hidden)
    np.testing.assert_allclose(out[0], expected, atol=1e-5)


def test_embedder_cache(tiny_bert, caption_vocab):
    model, tokenizer = tiny_bert
    v = caption_vocab
    captions = np.asarray([[v("<start>"), v("a"), v("<end>")]], np.int32)
    embedder = BertCaptionEmbedder(v, model=model, tokenizer=tokenizer)
    first = embedder(captions)
    assert len(embedder._cache) == 1
    second = embedder(captions)
    np.testing.assert_array_equal(first, second)


def test_batched_matches_single(tiny_bert, caption_vocab):
    """Batched attention-masked forward == per-caption forward."""
    model, tokenizer = tiny_bert
    v = caption_vocab
    caps = np.asarray([
        [v("<start>"), v("a"), v("man"), v("riding"), v("<end>")],
        [v("<start>"), v("beach"), v("."), v("<pad>"), v("<pad>")],
    ], np.int32)
    batched = BertCaptionEmbedder(v, model=model, tokenizer=tokenizer)(caps)
    for i in range(2):
        single = BertCaptionEmbedder(
            v, model=model, tokenizer=tokenizer)(caps[i: i + 1])
        np.testing.assert_allclose(batched[i], single[0], atol=1e-5)


@pytest.mark.parametrize("device", [False, True])
def test_lengths_strip_pads_like_batch1(tiny_bert, caption_vocab, device):
    """Eval parity surface: passing ``lengths`` embeds each row's
    UNPADDED caption — the reference evals at batch 1 where no padding
    exists (reference: models/attention.py:473-494), and BERT is
    bidirectional, so literal '<pad>' words would perturb every real
    position's embedding. Rows come back zero-padded to the uniform
    (T+1) window."""
    model, tokenizer = tiny_bert
    v = caption_vocab
    caps = np.asarray([
        [v("<start>"), v("a"), v("man"), v("riding"), v("<end>")],
        [v("<start>"), v("beach"), v("<end>"), v("<pad>"), v("<pad>")],
    ], np.int32)
    lengths = np.asarray([5, 3])
    emb = BertCaptionEmbedder(v, model=model, tokenizer=tokenizer,
                              device=device)
    out = np.asarray(emb(caps, lengths=lengths))
    assert out.shape[:2] == (2, 6)
    # Row 1 must equal embedding the unpadded 3-word caption alone...
    single = BertCaptionEmbedder(v, model=model, tokenizer=tokenizer)(
        caps[1:2, :3])
    np.testing.assert_allclose(out[1, :4], single[0], atol=1e-5)
    np.testing.assert_array_equal(out[1, 4:], 0.0)
    # ...whereas the padded text demonstrably differs (the bug this
    # guards against: pad words leaking into the eval BERT text).
    padded = BertCaptionEmbedder(v, model=model, tokenizer=tokenizer)(caps)
    assert np.abs(np.asarray(padded)[1, :4] - out[1, :4]).max() > 1e-4


def test_word_memo_matches_full_tokenize(tiny_bert, tmp_path):
    """_tokenize_rows' per-word fast path must be bit-identical to the
    original per-caption tokenize + piece_word_segments walk — including
    words that defeat the fast path: 'café' (wordpiece NORMALIZES to
    'cafe', so the walk never reconciles) and 'a#' (the '#'-stripped
    target matches EARLY, leaving a piece unconsumed). Both must route
    the caption to the exact slow walk and reproduce its degraded seg."""
    from transformers import BertConfig, BertModel, BertTokenizer

    vocab_path = tmp_path / "vocab.txt"
    vocab_path.write_text("\n".join(WORDPIECES + ["cafe", "#"]))
    tokenizer = BertTokenizer(str(vocab_path), do_lower_case=True)
    import torch as _torch

    _torch.manual_seed(0)
    config = BertConfig(
        vocab_size=len(WORDPIECES) + 2, hidden_size=16,
        num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=32, max_position_embeddings=64)
    model = BertModel(config).eval()

    v = Vocabulary()
    v.add_word(PAD_TOKEN)
    for w in ["a", "man", "riding", "horse", "café", "a#", "."]:
        v.add_word(w)
    v.add_word(START_TOKEN)
    v.add_word(END_TOKEN)
    v.add_word(UNK_TOKEN)

    embedder = BertCaptionEmbedder(v, model=model, tokenizer=tokenizer)
    captions = [
        [v("<start>"), v("a"), v("man"), v("riding"), v("<end>")],
        [v("<start>"), v("café"), v("horse"), v("<end>"), v("<pad>")],
        [v("<start>"), v("a#"), v("man"), v("<end>"), v("<pad>")],
        [v("<start>"), v("zzz"), v("."), v("<end>"), v("<pad>")],
    ]
    keys = [tuple(row) for row in captions]
    rows = embedder._tokenize_rows(keys)
    assert len(embedder._word_memo) > 0
    clean_flags = {w: c for w, (_, c) in embedder._word_memo.items()}
    assert clean_flags["café"] is False
    assert clean_flags["a#"] is False
    assert clean_flags["riding"] is True

    for key, (ids, seg) in zip(keys, rows):
        text = "[CLS] " + " ".join(v.i2w[t] for t in key)
        pieces = tokenizer.tokenize(text)
        want_ids = np.asarray(
            tokenizer.convert_tokens_to_ids(pieces), np.int32)
        want_seg = piece_word_segments(text.split(), pieces)
        np.testing.assert_array_equal(ids, want_ids)
        np.testing.assert_array_equal(seg, want_seg)


@pytest.mark.parametrize("device", [False, True])
def test_eviction_keeps_current_batch(tiny_bert, caption_vocab, device):
    """Overflow eviction must not drop entries the CURRENT batch needs:
    a batch mixing an already-cached caption with enough new ones to
    overflow used to clear() the cached key and KeyError on the final
    per-key lookup."""
    model, tokenizer = tiny_bert
    v = caption_vocab
    a = [v("<start>"), v("a"), v("<end>")]
    b = [v("<start>"), v("man"), v("<end>")]
    c = [v("<start>"), v("beach"), v("<end>")]
    d = [v("<start>"), v("riding"), v("<end>")]
    embedder = BertCaptionEmbedder(v, model=model, tokenizer=tokenizer,
                                   cache_size=3, device=device)
    first = embedder(np.asarray([a, b], np.int32))
    # a cached; adding c,d overflows 2+2 > 3 while a is still needed.
    mixed = embedder(np.asarray([a, c, d], np.int32))
    np.testing.assert_allclose(np.asarray(mixed[0]),
                               np.asarray(first[0]), atol=1e-5)
    # The working set survived the reset.
    out = embedder(np.asarray([a, c], np.int32))
    np.testing.assert_allclose(np.asarray(out[1]),
                               np.asarray(mixed[1]), atol=1e-5)
