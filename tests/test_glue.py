"""Task-metric registry (epoch_wrapup) + MLM collators."""

import numpy as np

from vqattack_tpu.data.collators import mlm_collate
from vqattack_tpu.text.tokenizer import WordPieceTokenizer
from vqattack_tpu.train.task_metrics import Accuracy, TaskMetricRegistry


def test_accuracy_ignores_minus100():
    a = Accuracy()
    logits = np.array([[0.1, 0.9], [0.9, 0.1], [0.2, 0.8]])
    labels = np.array([1, -100, 0])
    a.update_logits(logits, labels)
    assert a.compute() == 0.5  # one right, one wrong, one ignored


def test_registry_epoch_wrapup():
    reg = TaskMetricRegistry(["vqa", "mlm"])
    reg.update("vqa", loss=1.0,
               logits=np.array([[0.0, 2.0]]), targets=np.array([[0.0, 0.7]]))
    reg.update("mlm", loss=2.0,
               logits=np.array([[[0.1, 0.9]]]), labels=np.array([[1]]))
    out = reg.epoch_wrapup()
    assert out["vqa/metric"] == 0.7
    assert out["mlm/metric"] == 1.0
    assert out["the_metric"] == 1.7
    assert out["vqa/loss"] == 1.0
    # reset happened
    out2 = reg.epoch_wrapup()
    assert out2["the_metric"] == 0.0


def test_mlm_collate_token_and_whole_word():
    tok = WordPieceTokenizer.toy(["the", "dog", "play", "##ing", "red"])
    rng = np.random.default_rng(0)
    out = mlm_collate(
        ["the dog playing"] * 16, tok, max_length=8, mlm_probability=0.5,
        rng=rng,
    )
    assert out["text_ids"].shape == (16, 8)
    # labels only where masked, and original ids preserved there
    lab = out["text_labels_mlm"]
    masked = lab != -100
    assert masked.sum() > 0
    assert (out["text_ids"][masked] == lab[masked]).all()
    assert (out["text_labels"] == -100).all()

    # whole-word: 'play' and '##ing' always masked together
    rng = np.random.default_rng(1)
    out2 = mlm_collate(
        ["the dog playing"] * 64, tok, max_length=8, mlm_probability=0.5,
        whole_word=True, rng=rng,
    )
    lab2 = out2["text_labels_mlm"]
    # token positions: CLS the dog play ##ing SEP -> play at 3, ##ing at 4
    both = (lab2[:, 3] != -100) == (lab2[:, 4] != -100)
    assert both.all(), "whole-word units must mask together"
