"""Word filter for the substitution attack.

The reference merges a hand-curated filler list with NLTK English stopwords
and punctuation (``filter_words.py:1`` + ``adv_attack.py:27-28``): words on
the list are never substitution targets.  NLTK's corpus download needs
network, so the standard English stopword inventory is vendored here; the
whole list is a plain data set users can extend via
:func:`default_filter_words`'s ``extra`` argument.
"""

from __future__ import annotations

from typing import FrozenSet, Iterable, Optional

# the standard English stopword inventory (articles, pronouns, auxiliaries,
# prepositions, conjunctions) as shipped by common NLP toolkits
_STOPWORDS = """
a about above after again against all am an and any are aren't as at be
because been before being below between both but by can't cannot could
couldn't did didn't do does doesn't doing don't down during each few for from
further had hadn't has hasn't have haven't having he he'd he'll he's her here
here's hers herself him himself his how how's i i'd i'll i'm i've if in into
is isn't it it's its itself let's me more most mustn't my myself no nor not of
off on once only or other ought our ours ourselves out over own same shan't
she she'd she'll she's should shouldn't so some such than that that's the
their theirs them themselves then there there's these they they'd they'll
they're they've this those through to too under until up very was wasn't we
we'd we'll we're we've were weren't what what's when when's where where's
which while who who's whom why why's with won't would wouldn't you you'd
you'll you're you've your yours yourself yourselves
""".split()

# question-scaffold / filler words that carry no substitutable content in VQA
# questions (the reference's hand-curated list serves the same role)
_FILLERS = """
many much kind type sort color colour shape side part thing things going
doing done make makes made may might must shall will say says said
also just still yet ever never always often sometimes somewhere anywhere
everyone everything anything something someone nobody none one ones two three
yes maybe etc per via upon among amongst beside besides near next behind
front top bottom left right middle across along around toward towards within
without s t re ve ll d m o y
""".split()

_PUNCT = list("?.!,;:'\"()[]{}-")


def default_filter_words(extra: Optional[Iterable[str]] = None) -> FrozenSet[str]:
    words = set(_STOPWORDS) | set(_FILLERS) | set(_PUNCT)
    if extra:
        words |= set(extra)
    return frozenset(words)


# the answer-word filter applied before paraphrase masking
# (``adv_attack.py:155-160`` strips these from answer word lists)
ANSWER_STOPWORDS = ("on", "and", "in", "his", "her", "its")


def filter_answer_words(words: Iterable[str]) -> list:
    return [w for w in words if w not in ANSWER_STOPWORDS]
