"""BERT contextual caption embeddings (host-side).

Reproduces the reference BERT path (reference: models/attention.py:96-100,
166-215): captions are detokenized from vocab ids (special tokens appear
as literal '<start>'/'<end>'/'<pad>' words), prefixed with '[CLS]',
wordpiece-tokenized, run through bert-base-uncased in eval mode, and the
final hidden layer is re-aligned to whole vocab words by **summing** the
piece embeddings of each word.

Two reference quirks preserved because parity depends on them:
 - the '[CLS]' token is included in the aligned output, so row t holds
   the contextual embedding of word t-1 (the reference's scanner appends
   [CLS]'s embedding first, attention.py:190-196); since BERT is
   bidirectional this leaks rightward context — it is why the reference's
   bert_attention metrics are far above the other decoders
 - alignment sums piece embeddings rather than averaging
   (attention.py:205)

This is string processing + a torch CPU forward, so it stays host-side
(BERT never enters the TPU program); embeddings are batched (the
reference loops captions one at a time) and memoized across epochs.
"""

import os

import numpy as np

BERT_DIM = 768


def piece_word_segments(words, pieces):
    """The alignment walk of ``align_pieces_to_words`` as indices only:

    Degradation note (both walks here, kept in lockstep): if a word's
    wordpieces never reconcatenate to the word (wordpiece NORMALIZES,
    e.g. accent-stripped 'cafe' vs target 'café'), the walk consumes
    all remaining pieces into that word and later words read zero rows.
    The reference degrades differently — its walk never advances j on a
    failed match and silently re-reads the same pieces for subsequent
    words (attention.py:185-209) — i.e. both emit garbage for such
    captions, in different shapes; COCO captions are effectively ASCII
    so neither path is exercised in the published runs.

    Returns (len(pieces),) int32 with the word index each piece's
    embedding is summed into, or -1 for pieces the walk never consumes.
    Used by the device-aligned path (segment-sum on TPU); kept in exact
    lockstep with the walk below (tested equivalent in
    tests/test_bert_embed.py).
    """
    seg = np.full(len(pieces), -1, np.int32)
    j = 0
    for wi, word in enumerate(words):
        target = word.replace("#", "").lower()
        built = ""
        while j < len(pieces):
            piece = pieces[j]
            seg[j] = wi
            j += 1
            built += piece.replace("#", "")
            if built.lower() == target or piece == "[UNK]":
                break
    return seg


def align_pieces_to_words(words, pieces, piece_embeddings):
    """Sum piece embeddings per whitespace word.

    Args:
        words: list of str — the whitespace split, INCLUDING '[CLS]'.
        pieces: list of str — wordpiece tokens, starting with '[CLS]'.
        piece_embeddings: (len(pieces), D) array.

    Returns:
        (len(words), D) array.
    """
    out = []
    j = 0
    for word in words:
        target = word.replace("#", "").lower()
        acc = None
        built = ""
        while j < len(pieces):
            piece = pieces[j]
            emb = piece_embeddings[j]
            j += 1
            acc = emb if acc is None else acc + emb
            built += piece.replace("#", "")
            if built.lower() == target or piece == "[UNK]":
                break
        out.append(acc if acc is not None
                   else np.zeros_like(piece_embeddings[0]))
    return np.stack(out)


class BertCaptionEmbedder:
    """Callable: (B, T) vocab-id captions -> (B, T+1, D) aligned
    embeddings (row 0 is [CLS], row t is word t-1; see module docstring).
    """

    def __init__(self, vocab, model=None, tokenizer=None, cache_size=50000,
                 device=False, int8=False):
        self.vocab = vocab
        self._cache = {}
        self._cache_size = cache_size
        # Per-WORD wordpiece memo (see _word_pieces). Unbounded on
        # purpose: its keyspace is the caption vocabulary (~10k types on
        # real COCO, reference vocabulary.py:38-60), not the caption
        # space, so it saturates within the first few hundred batches.
        self._word_memo = {}
        if model is None or tokenizer is None:
            model, tokenizer = _load_default_bert()
        self.model = model
        self.tokenizer = tokenizer
        self.model.eval()
        self.jax_bert = None
        if device:
            # TPU-resident forward: the torch model is only the weight
            # source (models/bert_jax.py). The host keeps tokenization
            # and piece->word alignment (string logic, like the
            # reference attention.py:166-215).
            from .bert_jax import JaxBert

            self.jax_bert = JaxBert(model, int8=int8)

    def _embed_texts(self, texts):
        """Run BERT over a batch of '[CLS] ...' texts; returns per-text
        (pieces, piece_embeddings)."""
        piece_lists = [self.tokenizer.tokenize(t) for t in texts]
        max_len = max(len(p) for p in piece_lists)
        ids = np.zeros((len(texts), max_len), np.int64)
        attn = np.zeros((len(texts), max_len), np.int64)
        for i, pieces in enumerate(piece_lists):
            tok_ids = self.tokenizer.convert_tokens_to_ids(pieces)
            ids[i, : len(tok_ids)] = tok_ids
            attn[i, : len(tok_ids)] = 1
        if self.jax_bert is not None:
            hidden = self.jax_bert(ids, attn)
        else:
            import torch

            with torch.no_grad():
                out = self.model(
                    input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(attn))
            # final layer == layer 11
            hidden = out.last_hidden_state.numpy()
        return [(pieces, hidden[i, : len(pieces)])
                for i, pieces in enumerate(piece_lists)]

    def __call__(self, captions, lengths=None):
        """captions: (B, T) int array -> (B, T+1, D) float32.

        ``lengths`` (optional, (B,) true caption lengths) is the EVAL
        parity switch: BERT is bidirectional, so the literal '<pad>'
        words of a padded row perturb every other position's contextual
        embedding. The reference TRAINS on padded rows (its collate pads
        before _create_bert_embeddings, attention.py:242-247 on the
        padded batch) but EVALS at batch 1 where no padding exists
        (attention.py:473-494) — so training calls leave ``lengths``
        unset (pads stay in the text, matching the reference), while the
        batched eval passes true lengths so each sample's text is its
        unpadded caption, exactly what the reference's batch-1 loop
        embeds. Rows are zero-padded back to the uniform (T+1) window;
        the eval step never reads past a sample's decode length.

        Device mode returns a DEVICE array: BERT forward AND the
        piece->word sum run in one jitted program, so only the tiny
        int arrays (piece ids / mask / segment indices) cross the host
        link and the result feeds the train step without a fetch or
        re-upload. The cache then memoizes the host string work
        (tokenization + segment walk) instead of embeddings — the
        on-chip forward is ~ms, the strings are the recurring cost.
        """
        captions = np.asarray(captions)
        if lengths is None:
            keys = [tuple(int(t) for t in row) for row in captions]
        else:
            keys = [tuple(int(t) for t in row[: max(int(n), 1)])
                    for row, n in zip(captions, lengths)]
        if self.jax_bert is not None:
            return self._call_device(captions, keys)
        missing = [k for k in dict.fromkeys(keys) if k not in self._cache]
        if missing:
            texts = ["[CLS] " + " ".join(self.vocab.i2w[t] for t in k)
                     for k in missing]
            fresh = {}
            for k, text, (pieces, embs) in zip(
                    missing, texts, self._embed_texts(texts)):
                words = text.split()
                aligned = align_pieces_to_words(words, pieces, embs)
                fresh[k] = aligned.astype(np.float32)
            self._merge_cache(keys, fresh)
        n_words = captions.shape[1] + 1  # + [CLS] row
        first = self._cache[keys[0]]
        out = np.zeros((len(keys), n_words, first.shape[-1]), np.float32)
        for i, k in enumerate(keys):
            row = self._cache[k]
            out[i, : row.shape[0]] = row
        return out

    def _merge_cache(self, keys, fresh):
        """Insert ``fresh`` with eviction that can never drop entries the
        CURRENT call still needs: on overflow the cache resets to exactly
        this batch's working set (cached-and-needed + fresh). A bare
        clear() here would evict keys that were cached before this call
        but appear in ``keys``, and the final per-key lookup would
        KeyError once the cache first fills on a batch that mixes old
        and new captions."""
        if len(self._cache) + len(fresh) > self._cache_size:
            needed = {k: self._cache[k] for k in keys
                      if k in self._cache}
            self._cache.clear()
            self._cache.update(needed)
        self._cache.update(fresh)

    def _word_pieces(self, word):
        """Per-WORD wordpiece memo: word -> (piece ids, clean).

        BertTokenizer's BasicTokenizer splits on whitespace before
        wordpiece runs per basic token, and special tokens like '[CLS]'
        are never-split — so tokenizing a whitespace word in isolation
        yields exactly its slice of the full-caption tokenization
        (equivalence tested against the full tokenize in
        tests/test_bert_embed.py). ``clean`` records whether the
        reference alignment walk (piece_word_segments), run on just this
        word's pieces, would break exactly at the last piece: when every
        word of a caption is clean, the caption's walk is provably the
        per-word concatenation, and the per-caption tokenizer call +
        Python walk (the measured hot host cost of --use_bert training,
        tools/bench_bert.py) collapse to dict lookups. Any non-clean
        word (normalizing wordpieces, early target match, empty piece
        list) routes the whole caption to the exact slow walk, so the
        degradation semantics documented on piece_word_segments are
        preserved bit-for-bit."""
        hit = self._word_memo.get(word)
        if hit is None:
            pieces = self.tokenizer.tokenize(word)
            ids = np.asarray(
                self.tokenizer.convert_tokens_to_ids(pieces), np.int32)
            target = word.replace("#", "").lower()
            built, clean = "", False
            for n, piece in enumerate(pieces):
                built += piece.replace("#", "")
                if built.lower() == target or piece == "[UNK]":
                    clean = n == len(pieces) - 1
                    break
            hit = self._word_memo[word] = (ids, clean)
        return hit

    def _tokenize_rows(self, keys):
        """Memoized host string work: caption key -> (piece ids, seg)."""
        missing = [k for k in dict.fromkeys(keys) if k not in self._cache]
        if missing:
            fresh = {}
            for k in missing:
                words = ["[CLS]"] + [self.vocab.i2w[t] for t in k]
                per_word = [self._word_pieces(w) for w in words]
                if all(clean for _, clean in per_word):
                    ids = np.concatenate([w_ids for w_ids, _ in per_word])
                    seg = np.repeat(
                        np.arange(len(words), dtype=np.int32),
                        [len(w_ids) for w_ids, _ in per_word])
                else:
                    text = " ".join(words)
                    pieces = self.tokenizer.tokenize(text)
                    ids = np.asarray(
                        self.tokenizer.convert_tokens_to_ids(pieces),
                        np.int32)
                    # text.split(), not ``words``: an (anomalous) empty
                    # vocab word vanishes in the joined text, and the
                    # walk must see the same word list it always did.
                    seg = piece_word_segments(text.split(), pieces)
                fresh[k] = (ids, seg)
            self._merge_cache(keys, fresh)
        return [self._cache[k] for k in keys]

    def _call_device(self, captions, keys):
        rows = self._tokenize_rows(keys)
        n_words = captions.shape[1] + 1  # + [CLS] row
        max_len = max(len(ids) for ids, _ in rows)
        ids = np.zeros((len(rows), max_len), np.int32)
        attn = np.zeros((len(rows), max_len), np.int32)
        seg = np.full((len(rows), max_len), -1, np.int32)
        for i, (row_ids, row_seg) in enumerate(rows):
            ids[i, : len(row_ids)] = row_ids
            attn[i, : len(row_ids)] = 1
            seg[i, : len(row_ids)] = row_seg
        return self.jax_bert.aligned(ids, attn, seg, n_words)


def _load_default_bert():
    """bert-base-uncased from a local path (no-egress environments must
    set BERT_MODEL_DIR); falls back to the hub name when reachable."""
    from transformers import BertModel, BertTokenizer

    source = os.environ.get("BERT_MODEL_DIR", "bert-base-uncased")
    try:
        model = BertModel.from_pretrained(source)
        tokenizer = BertTokenizer.from_pretrained(source)
        return model, tokenizer
    except Exception as exc:
        raise RuntimeError(
            "bert-base-uncased unavailable (no network?). Set "
            "BERT_MODEL_DIR to a local checkout, or pass model/tokenizer "
            "to BertCaptionEmbedder explicitly.") from exc
