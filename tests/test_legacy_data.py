"""Legacy GloVe vocabulary + LSTM encoder integration."""

import jax
import numpy as np

from imagegenerator_tpu.data.legacy import LegacyCollate, Vocabulary, tokenize
from imagegenerator_tpu.models import TextEmbeddingLSTM


def test_vocabulary_unk_pad():
    vocab = Vocabulary.synthetic(["a", "red", "square"], dim=8)
    assert len(vocab) == 5  # 3 words + UNK + PAD
    np.testing.assert_allclose(
        vocab.vectors[vocab.unk_index], vocab.vectors[:3].mean(axis=0), atol=1e-6
    )
    np.testing.assert_allclose(vocab.vectors[vocab.pad_index], 0.0)

    ids = vocab.numericalize("a RED unknownword")
    assert ids == [vocab.stoi["a"], vocab.stoi["red"], vocab.unk_index]


def test_glove_file_parsing(tmp_path):
    p = tmp_path / "glove.txt"
    p.write_text("hello 1.0 2.0 3.0\nworld 4.0 5.0 6.0\n")
    vocab = Vocabulary.from_glove_file(str(p))
    assert vocab.dim == 3
    np.testing.assert_allclose(vocab.vectors[vocab.stoi["hello"]], [1, 2, 3])


def test_collate_fixed_shape():
    vocab = Vocabulary.synthetic(["a", "dog"], dim=4)
    collate = LegacyCollate(vocab, max_length=6)
    batch = collate(["a dog", "a a a a a a a a a"])
    assert batch["input_ids"].shape == (2, 6)
    assert batch["input_ids"][0, 2] == vocab.pad_index  # padded tail


def test_lstm_on_legacy_tokens():
    """The legacy path end-to-end: vocab -> collate -> frozen-embedding
    LSTM encoder producing tem (textEmbed.py role)."""
    vocab = Vocabulary.synthetic(["a", "red", "square", "dog"], dim=8)
    collate = LegacyCollate(vocab, max_length=5)
    batch = collate(["a red square", "a dog"])

    model = TextEmbeddingLSTM(
        vocab_size=len(vocab), embed_size=8, hidden_size=4, tem_size=16
    )
    variables = model.init(jax.random.key(0), batch["input_ids"])
    # splice the pretrained vectors into the embedding table
    variables = {
        "params": {
            **variables["params"],
            "Embed_0": {"embedding": vocab.vectors},
        }
    }
    tem = model.apply(variables, batch["input_ids"])
    assert tem.shape == (2, 16)
    assert np.isfinite(np.asarray(tem)).all()
