"""Official VQA evaluation: answer normalization + soft accuracy.

Reference: ``ALBEF_attack/vqaTools/vqaEval.py`` — the official pipeline:
contraction restoration, punctuation rules, number-word mapping, article
removal, then per-question accuracy ``min(1, #matching_humans / 3)`` averaged
over 10-choose-9 human subsets (``vqaEval.py:100`` family), equivalently
``min(1, count/3)`` per unique answer.
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence

_CONTRACTIONS = {
    "aint": "ain't", "arent": "aren't", "cant": "can't", "couldve": "could've",
    "couldnt": "couldn't", "didnt": "didn't", "doesnt": "doesn't",
    "dont": "don't", "hadnt": "hadn't", "hasnt": "hasn't", "havent": "haven't",
    "hed": "he'd", "hes": "he's", "howd": "how'd", "howll": "how'll",
    "hows": "how's", "im": "i'm", "ive": "i've", "isnt": "isn't",
    "itd": "it'd", "itll": "it'll", "lets": "let's", "mightve": "might've",
    "mustve": "must've", "shant": "shan't", "shed": "she'd", "shes": "she's",
    "shouldve": "should've", "shouldnt": "shouldn't", "thered": "there'd",
    "therell": "there'll", "theres": "there's", "theyd": "they'd",
    "theyll": "they'll", "theyre": "they're", "theyve": "they've",
    "wasnt": "wasn't", "wed": "we'd", "weve": "we've", "werent": "weren't",
    "whatll": "what'll", "whatre": "what're", "whats": "what's",
    "whatve": "what've", "whens": "when's", "whered": "where'd",
    "wheres": "where's", "whereve": "where've", "whod": "who'd",
    "wholl": "who'll", "whos": "who's", "whove": "who've", "whyll": "why'll",
    "whyre": "why're", "whys": "why's", "wont": "won't",
    "wouldve": "would've", "wouldnt": "wouldn't", "yall": "y'all",
    "youd": "you'd", "youll": "you'll", "youre": "you're", "youve": "you've",
}
_NUMBER_MAP = {
    "none": "0", "zero": "0", "one": "1", "two": "2", "three": "3",
    "four": "4", "five": "5", "six": "6", "seven": "7", "eight": "8",
    "nine": "9", "ten": "10",
}
_ARTICLES = {"a", "an", "the"}
_PERIOD_STRIP = re.compile(r"(?!<=\d)(\.)(?!\d)")
_COMMA_STRIP = re.compile(r"(\d)(,)(\d)")
_PUNCT = "[;/\\[\\]\"{}()=+\\\\_\\-><@`,?!]"


def process_punctuation(text: str) -> str:
    """Official rule: a punctuation char adjacent to a space (or any
    digit,comma,digit pattern present) is deleted; otherwise it becomes a
    space.  Periods not inside numbers are deleted."""
    out = text
    for p in ";/[]\"{}()=+\\_-><@`,?!":
        if (p + " " in text or " " + p in text) or re.search(_COMMA_STRIP, text):
            out = out.replace(p, "")
        else:
            out = out.replace(p, " ")
    out = _PERIOD_STRIP.sub("", out)
    return out


def process_digit_article(text: str) -> str:
    out: List[str] = []
    for word in text.lower().split():
        word = _NUMBER_MAP.get(word, word)
        if word in _ARTICLES:
            continue
        out.append(_CONTRACTIONS.get(word, word))
    return " ".join(out)


def normalize_answer(ans: str) -> str:
    ans = ans.replace("\n", " ").replace("\t", " ").strip()
    return process_digit_article(process_punctuation(ans))


def vqa_soft_accuracy(pred: str, gt_answers: Sequence[str]) -> float:
    """The official leave-one-annotator-out accuracy (``vqaEval.py:84-105``):
    for each of the n human answers, count the prediction's matches among
    the OTHER n-1 and take min(1, matches/3); average the n values.  This is
    NOT min(1, total_matches/3): with k total matches the official value is
    (k*min(1,(k-1)/3) + (n-k)*min(1,k/3)) / n — e.g. k=3 of 10 scores 0.9,
    not 1.0.

    Normalization follows the official quirk: the prediction gets the full
    punctuation + digit/article pipeline, ground truths only the punctuation
    pass, and only when the answer set is non-unanimous."""
    p = normalize_answer(pred)
    gts = list(gt_answers)
    if len(set(gts)) > 1:
        gts = [process_punctuation(a) for a in gts]
    n = len(gts)
    if n == 0:
        return 0.0
    k = sum(1 for g in gts if g == p)
    acc_when_match_left_out = min(1.0, (k - 1) / 3.0)
    acc_when_other_left_out = min(1.0, k / 3.0)
    return (k * acc_when_match_left_out + (n - k) * acc_when_other_left_out) / n


class VQAEval:
    """Accumulating evaluator (``vqaTools/vqaEval.py`` interface)."""

    def __init__(self):
        self.accuracies: List[float] = []
        self.per_question: Dict[str, float] = {}

    def update(self, qid, pred: str, gt_answers: Sequence[str]) -> float:
        acc = vqa_soft_accuracy(pred, gt_answers)
        self.accuracies.append(acc)
        self.per_question[str(qid)] = acc
        return acc

    @property
    def accuracy(self) -> float:
        return 100.0 * sum(self.accuracies) / max(1, len(self.accuracies))
