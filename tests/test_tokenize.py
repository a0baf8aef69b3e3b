"""Treebank tokenizer parity tests.

Golden expectations were produced with nltk.word_tokenize (punkt +
TreebankWordTokenizer) — the function the reference calls at
dataset.py:45 and vocabulary.py:45."""

from icd_tpu.data.tokenize import treebank_word_tokenize, word_tokenize


def test_simple_caption():
    assert word_tokenize("a man riding a horse on the beach.") == [
        "a", "man", "riding", "a", "horse", "on", "the", "beach", "."]


def test_comma_and_period():
    assert word_tokenize("a large, brown dog.") == [
        "a", "large", ",", "brown", "dog", "."]


def test_hyphen_kept():
    assert word_tokenize("a black-and-white photo.") == [
        "a", "black-and-white", "photo", "."]


def test_contractions():
    assert word_tokenize("it's a dog that isn't small.") == [
        "it", "'s", "a", "dog", "that", "is", "n't", "small", "."]


def test_parens_and_numbers():
    assert word_tokenize("two dogs (2) playing.") == [
        "two", "dogs", "(", "2", ")", "playing", "."]


def test_no_trailing_period():
    assert word_tokenize("a man riding a horse") == [
        "a", "man", "riding", "a", "horse"]


def test_abbreviation_mid_sentence():
    # Mid-token periods stay attached (no sentence boundary).
    assert treebank_word_tokenize("a u.s. flag on a pole.") == [
        "a", "u.s.", "flag", "on", "a", "pole", "."]


def test_multi_sentence():
    toks = word_tokenize("a man rides. the horse is brown.")
    assert toks == ["a", "man", "rides", ".", "the", "horse",
                    "is", "brown", "."]


def test_possessive():
    assert word_tokenize("the dog's ball.") == [
        "the", "dog", "'s", "ball", "."]


def test_slash_and_amp():
    assert word_tokenize("fish & chips on a plate.") == [
        "fish", "&", "chips", "on", "a", "plate", "."]
