"""Rule-based IFEval checker.

Implements the verifiable-instruction rules of the IFEval benchmark
(the suite the reference scores through opencompass,
`/root/reference/bench/eval.py:31-106` — its config names the
`IFEval` dataset whose rows carry `instruction_id_list` + per-instruction
`kwargs`).  Scoring follows the benchmark's *strict* protocol: an example
counts only when EVERY instruction is followed by the raw response.

Each rule: fn(response: str, **kwargs) -> bool.  `check()` returns per-
instruction verdicts (None for instruction ids this checker doesn't
implement — reported separately so coverage is auditable, never silently
counted as correct).
"""

from __future__ import annotations

import json
import re
import string
from typing import List, Optional, Tuple

_COMPARE = {
    "less than": lambda n, t: n < t,
    "at least": lambda n, t: n >= t,
}


def _words(text: str) -> List[str]:
    return re.findall(r"\w+", text)


def _sentences(text: str) -> List[str]:
    parts = re.split(r"[.!?]+(?:\s|$)", text)
    return [p for p in parts if p.strip()]


def _paragraphs(text: str, sep: str = "***") -> List[str]:
    return [p for p in text.split(sep)]


def _rel(relation: Optional[str]):
    return _COMPARE.get(relation or "at least", _COMPARE["at least"])


# --------------------------------------------------------------- keywords

def keywords_existence(resp, keywords=None, **_):
    return all(re.search(rf"\b{re.escape(k)}\b", resp, re.I)
               for k in (keywords or []))


def keywords_frequency(resp, keyword=None, frequency=None, relation=None,
                       **_):
    n = len(re.findall(rf"\b{re.escape(keyword)}\b", resp, re.I))
    return _rel(relation)(n, int(frequency))


def keywords_forbidden(resp, forbidden_words=None, **_):
    return not any(re.search(rf"\b{re.escape(w)}\b", resp, re.I)
                   for w in (forbidden_words or []))


def letter_frequency(resp, letter=None, let_frequency=None,
                     let_relation=None, **_):
    n = resp.lower().count(str(letter).lower())
    return _rel(let_relation)(n, int(let_frequency))


# ------------------------------------------------------ length constraints

def number_words(resp, num_words=None, relation=None, **_):
    return _rel(relation)(len(_words(resp)), int(num_words))


def number_sentences(resp, num_sentences=None, relation=None, **_):
    return _rel(relation)(len(_sentences(resp)), int(num_sentences))


def number_paragraphs(resp, num_paragraphs=None, **_):
    paras = [p for p in _paragraphs(resp) if p.strip()]
    return len(paras) == int(num_paragraphs)


def nth_paragraph_first_word(resp, num_paragraphs=None, nth_paragraph=None,
                             first_word=None, **_):
    # paragraphs separated by blank lines for this instruction
    paras = [p.strip() for p in re.split(r"\n\s*\n", resp) if p.strip()]
    if len(paras) != int(num_paragraphs):
        return False
    i = int(nth_paragraph) - 1
    if not (0 <= i < len(paras)):
        return False
    w = _words(paras[i])
    return bool(w) and w[0].lower() == str(first_word).lower().strip(
        string.punctuation)


# ------------------------------------------------------ detectable content

def number_placeholders(resp, num_placeholders=None, **_):
    return len(re.findall(r"\[.*?\]", resp)) >= int(num_placeholders)


def postscript(resp, postscript_marker=None, **_):
    marker = re.escape(postscript_marker or "P.S.")
    # tolerate "P.S." vs "P.S" style variants like the reference checker
    marker = marker.replace(r"P\.S\.", r"P\.\s?S\.")
    return re.search(marker, resp) is not None


# ------------------------------------------------------- detectable format

def number_bullets(resp, num_bullets=None, **_):
    bullets = re.findall(r"^\s*[*-] ", resp, re.M)
    return len(bullets) == int(num_bullets)


def constrained_response(resp, **_):
    options = ("My answer is yes.", "My answer is no.",
               "My answer is maybe.")
    return any(o in resp for o in options)


def number_highlights(resp, num_highlights=None, **_):
    hits = [h for h in re.findall(r"\*[^\n*]+\*", resp) if h.strip("*").strip()]
    return len(hits) >= int(num_highlights)


def multiple_sections(resp, section_spliter=None, num_sections=None, **_):
    pat = rf"{re.escape(section_spliter or 'Section')}\s+\d+"
    return len(re.findall(pat, resp)) >= int(num_sections)


def json_format(resp, **_):
    text = resp.strip()
    # tolerate markdown fences
    text = re.sub(r"^```(?:json)?|```$", "", text, flags=re.M).strip()
    try:
        json.loads(text)
        return True
    except Exception:
        return False


def title_format(resp, **_):
    return re.search(r"<<[^\n<>]+>>", resp) is not None


# ------------------------------------------------------------- combination

def two_responses(resp, **_):
    parts = resp.split("******")
    parts = [p.strip() for p in parts]
    return len(parts) == 2 and all(parts) and parts[0] != parts[1]


def repeat_prompt(resp, prompt_to_repeat=None, **_):
    return resp.strip().startswith((prompt_to_repeat or "").strip())


# ---------------------------------------------------------------- startend

def end_checker(resp, end_phrase=None, **_):
    return resp.strip().endswith((end_phrase or "").strip())


def quotation(resp, **_):
    t = resp.strip()
    return len(t) >= 2 and t.startswith('"') and t.endswith('"')


# -------------------------------------------------------------- change case

def capital_word_frequency(resp, capital_frequency=None,
                           capital_relation=None, **_):
    caps = [w for w in _words(resp) if w.isupper() and len(w) > 0]
    return _rel(capital_relation)(len(caps), int(capital_frequency))


def english_capital(resp, **_):
    letters = [c for c in resp if c.isalpha()]
    return bool(letters) and all(c.isupper() for c in letters)


def english_lowercase(resp, **_):
    letters = [c for c in resp if c.isalpha()]
    return bool(letters) and all(c.islower() for c in letters)


# -------------------------------------------------------------- punctuation

def no_comma(resp, **_):
    return "," not in resp


RULES = {
    "keywords:existence": keywords_existence,
    "keywords:frequency": keywords_frequency,
    "keywords:forbidden_words": keywords_forbidden,
    "keywords:letter_frequency": letter_frequency,
    "length_constraints:number_words": number_words,
    "length_constraints:number_sentences": number_sentences,
    "length_constraints:number_paragraphs": number_paragraphs,
    "length_constraints:nth_paragraph_first_word": nth_paragraph_first_word,
    "detectable_content:number_placeholders": number_placeholders,
    "detectable_content:postscript": postscript,
    "detectable_format:number_bullet_lists": number_bullets,
    "detectable_format:constrained_response": constrained_response,
    "detectable_format:number_highlighted_sections": number_highlights,
    "detectable_format:multiple_sections": multiple_sections,
    "detectable_format:json_format": json_format,
    "detectable_format:title": title_format,
    "combination:two_responses": two_responses,
    "combination:repeat_prompt": repeat_prompt,
    "startend:end_checker": end_checker,
    "startend:quotation": quotation,
    "change_case:capital_word_frequency": capital_word_frequency,
    "change_case:english_capital": english_capital,
    "change_case:english_lowercase": english_lowercase,
    "punctuation:no_comma": no_comma,
}


def check(response: str, instruction_id_list: List[str],
          kwargs_list: Optional[List[dict]] = None
          ) -> Tuple[bool, List[Optional[bool]]]:
    """Returns (strict_all_followed, per_instruction verdicts).

    Unknown instruction ids yield a None verdict and score as
    NOT-followed in strict_all — the conservative choice relative to the
    official checker (which implements every rule): an example whose
    instructions we can't verify must not count as correct (ADVICE r3:
    excluding them inflated strict accuracy).  Callers can count Nones
    to report rule coverage alongside the score.
    """
    kwargs_list = kwargs_list or [{} for _ in instruction_id_list]
    verdicts: List[Optional[bool]] = []
    for iid, kw in zip(instruction_id_list, kwargs_list):
        fn = RULES.get(iid)
        if fn is None:
            verdicts.append(None)
            continue
        kw = {k: v for k, v in (kw or {}).items() if v is not None}
        try:
            verdicts.append(bool(fn(response, **kw)))
        except Exception:
            verdicts.append(False)
    return all(v is True for v in verdicts), verdicts
