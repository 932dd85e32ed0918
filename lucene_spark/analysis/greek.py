"""Greek analysis — lowercase/diacritic folding + the Ntais stemmer.

Role analogues: el/GreekAnalyzer.java (StandardTokenizer →
GreekLowerCaseFilter → StopFilter → GreekStemFilter),
el/GreekLowerCaseFilter.java (tonos/dialytika folding, final-sigma ς→σ),
el/GreekStemmer.java — "Development of a Stemmer for the Greek Language",
Georgios Ntais (the published algorithm the reference implements).

Validated against all of TestGreekStemmer.java's vectors in
tests/test_greek.py. The reference's two mixed-precedence guard
expressions (rule 0's and rule 8's `len > N && ends(..) || ends(..)`
chains) are reproduced exactly — the guard binds only to the first
alternative there.
"""

from __future__ import annotations

# GreekLowerCaseFilter.java:54-110 — diacritic folding + final sigma
_FOLD = {
    "ς": "σ",
    "Ά": "α", "ά": "α",
    "Έ": "ε", "έ": "ε",
    "Ή": "η", "ή": "η",
    "Ί": "ι", "Ϊ": "ι", "ί": "ι", "ϊ": "ι", "ΐ": "ι",
    "Ύ": "υ", "Ϋ": "υ", "ύ": "υ", "ϋ": "υ", "ΰ": "υ",
    "Ό": "ο", "ό": "ο",
    "Ώ": "ω", "ώ": "ω",
    "΢": "ς",   # reserved codepoint, kept for index compat (ref does)
}


def greek_normalize(tok: str) -> str:
    return "".join(_FOLD.get(c) or _FOLD.get(c.lower(), c.lower())
                   for c in tok)


_VOWELS = frozenset("αεηιουω")
_VOWELS_NO_Y = frozenset("αεηιοω")    # "NoY": υ excluded

_EXC4 = frozenset(["θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"])
_EXC6 = frozenset([
    "αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ", "φυσ",
    "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ", "μπαν",
    "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ",
    "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
    "υποδ", "φιλον", "φυλοδ", "χασ"])
_EXC7 = frozenset(["αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ",
                   "πεθ", "πικρ", "ποτ", "σιχ", "χ"])
_EXC8A = frozenset(["τρ", "τσ"])
_EXC8B = frozenset([
    "βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ", "καστελ",
    "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ", "π",
    "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ", "τσαρλατ",
    "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ", "γαλ",
    "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ",
    "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ",
    "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ",
    "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ",
    "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ",
    "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ",
    "νταβ", "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ", "περηφ",
    "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ", "στεφ", "ταβ", "τετ",
    "υπερηφ", "υποκοπ", "χαμηλοδαπ", "ψηλοταβ"])
_EXC9 = frozenset(["αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ",
                   "βαρον", "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ",
                   "παρακαλ", "σερπ", "σκελ", "συρφ", "τοκ", "υ", "δ",
                   "εμ", "θαρρ", "θ"])
_EXC12A = frozenset(["π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"])
_EXC12B = frozenset(["αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ",
                     "προ", "νισ"])
_EXC13 = frozenset(["διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"])
_EXC14 = frozenset(["φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ",
                    "λαμπιδ", "λεχ", "μ", "πατ", "ρ", "λ", "μεδ",
                    "μεσαζ", "υποτειν", "αμ", "αιθ", "ανηκ", "δεσποζ",
                    "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε",
                    "τσα"])
_EXC15A = frozenset([
    "αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ",
    "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν", "δροσοπ",
    "ξεφ", "νεοπ", "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ",
    "συμπ", "συντ", "τ", "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ",
    "αποτ", "αρτιπ", "διατ", "εν", "επιτ", "κροκαλοπ", "σιδηροπ", "λ",
    "ναυ", "ουλαμ", "ουρ", "π", "τρ", "μ"])
_EXC15B = frozenset(["ψοφ", "ναυλοχ"])
_EXC16 = frozenset(["ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον",
                    "επταν"])
_EXC17 = frozenset(["ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ",
                    "ευχρ", "κοινοχρ", "παλιμψ"])
_EXC18 = frozenset(["ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων"])
_EXC19 = frozenset(["παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ",
                    "ασουσ"])


def _ew(w: str, suf: str) -> bool:
    return w.endswith(suf)


def _vowel(w: str) -> bool:
    return bool(w) and w[-1] in _VOWELS


def _vowel_no_y(w: str) -> bool:
    return bool(w) and w[-1] in _VOWELS_NO_Y


def _rule0(w):
    n = len(w)
    if n > 9 and (_ew(w, "καθεστωτοσ") or _ew(w, "καθεστωτων")):
        return w[:-4]
    if n > 8 and (_ew(w, "γεγονοτοσ") or _ew(w, "γεγονοτων")):
        return w[:-4]
    if n > 8 and _ew(w, "καθεστωτα"):
        return w[:-3]
    if n > 7 and (_ew(w, "τατογιου") or _ew(w, "τατογιων")):
        return w[:-4]
    if n > 7 and _ew(w, "γεγονοτα"):
        return w[:-3]
    if n > 7 and _ew(w, "καθεστωσ"):
        return w[:-2]
    # reference precedence quirk: the length guard binds only to the first
    # alternative (GreekStemmer.java rule0); kept verbatim
    if ((n > 6 and _ew(w, "σκαγιου")) or _ew(w, "σκαγιων")
            or _ew(w, "ολογιου") or _ew(w, "ολογιων") or _ew(w, "κρεατοσ")
            or _ew(w, "κρεατων") or _ew(w, "περατοσ") or _ew(w, "περατων")
            or _ew(w, "τερατοσ") or _ew(w, "τερατων")):
        return w[:-4]
    if n > 6 and _ew(w, "τατογια"):
        return w[:-3]
    if n > 6 and _ew(w, "γεγονοσ"):
        return w[:-2]
    if n > 5 and (_ew(w, "φαγιου") or _ew(w, "φαγιων") or _ew(w, "σογιου")
                  or _ew(w, "σογιων")):
        return w[:-4]
    if n > 5 and (_ew(w, "σκαγια") or _ew(w, "ολογια") or _ew(w, "κρεατα")
                  or _ew(w, "περατα") or _ew(w, "τερατα")):
        return w[:-3]
    if n > 4 and (_ew(w, "φαγια") or _ew(w, "σογια") or _ew(w, "φωτοσ")
                  or _ew(w, "φωτων")):
        return w[:-3]
    if n > 4 and (_ew(w, "κρεασ") or _ew(w, "περασ") or _ew(w, "τερασ")):
        return w[:-2]
    if n > 3 and _ew(w, "φωτα"):
        return w[:-2]
    if n > 2 and _ew(w, "φωσ"):
        return w[:-1]
    return w


def _rule1(w):
    if len(w) > 4 and (_ew(w, "αδεσ") or _ew(w, "αδων")):
        w = w[:-4]
        if not (w.endswith(("οκ", "μαμ", "μαν", "μπαμπ", "πατερ", "γιαγι",
                            "νταντ", "κυρ", "θει", "πεθερ"))):
            w += "αδ"
    return w


def _rule2(w):
    if len(w) > 4 and (_ew(w, "εδεσ") or _ew(w, "εδων")):
        w = w[:-4]
        if w.endswith(("οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ", "κρασπ",
                       "μιλ")):
            w += "εδ"
    return w


def _rule3(w):
    if len(w) > 5 and (_ew(w, "ουδεσ") or _ew(w, "ουδων")):
        w = w[:-5]
        if w.endswith(("αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ", "σ",
                       "φλ", "φρ", "βελ", "λουλ", "χν", "σπ", "τραγ",
                       "φε")):
            w += "ουδ"
    return w


def _rule4(w):
    if len(w) > 3 and (_ew(w, "εωσ") or _ew(w, "εων")):
        w = w[:-3]
        if w in _EXC4:
            w += "ε"
    return w


def _rule5(w):
    if len(w) > 2 and _ew(w, "ια"):
        w = w[:-2]
        if _vowel(w):
            w += "ι"
    elif len(w) > 3 and (_ew(w, "ιου") or _ew(w, "ιων")):
        w = w[:-3]
        if _vowel(w):
            w += "ι"
    return w


def _rule6(w):
    removed = False
    if len(w) > 3 and (_ew(w, "ικα") or _ew(w, "ικο")):
        w = w[:-3]
        removed = True
    elif len(w) > 4 and (_ew(w, "ικου") or _ew(w, "ικων")):
        w = w[:-4]
        removed = True
    if removed and (_vowel(w) or w in _EXC6):
        w += "ικ"
    return w


def _rule7(w):
    if len(w) == 5 and _ew(w, "αγαμε"):
        return w[:-1]
    if len(w) > 7 and _ew(w, "ηθηκαμε"):
        w = w[:-7]
    elif len(w) > 6 and _ew(w, "ουσαμε"):
        w = w[:-6]
    elif len(w) > 5 and (_ew(w, "αγαμε") or _ew(w, "ησαμε")
                         or _ew(w, "ηκαμε")):
        w = w[:-5]
    if len(w) > 3 and _ew(w, "αμε"):
        w = w[:-3]
        if w in _EXC7:
            w += "αμ"
    return w


def _rule8(w):
    removed = False
    n = len(w)
    # the guard-binds-first-alternative quirk (rule8, three places) is
    # reproduced verbatim from the reference
    if n > 8 and _ew(w, "ιουντανε"):
        w = w[:-8]
        removed = True
    elif (n > 7 and _ew(w, "ιοντανε")) or _ew(w, "ουντανε") \
            or _ew(w, "ηθηκανε"):
        w = w[:-7]
        removed = True
    elif (n > 6 and _ew(w, "ιοτανε")) or _ew(w, "οντανε") \
            or _ew(w, "ουσανε"):
        w = w[:-6]
        removed = True
    elif (n > 5 and _ew(w, "αγανε")) or _ew(w, "ησανε") \
            or _ew(w, "οτανε") or _ew(w, "ηκανε"):
        w = w[:-5]
        removed = True
    if removed and w in _EXC8A:
        w += "αγαν"
    if len(w) > 3 and _ew(w, "ανε"):
        w = w[:-3]
        if _vowel_no_y(w) or w in _EXC8B:
            w += "αν"
    return w


def _rule9(w):
    if len(w) > 5 and _ew(w, "ησετε"):
        w = w[:-5]
    if len(w) > 3 and _ew(w, "ετε"):
        w = w[:-3]
        if (w in _EXC9 or _vowel_no_y(w)
                or w.endswith(("οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ",
                               "ενδ", "ευρ", "τιθ", "υπερθ", "ραθ", "ενθ",
                               "ροθ", "σθ", "πυρ", "αιν", "συνδ", "συν",
                               "συνθ", "χωρ", "πον", "βρ", "καθ", "ευθ",
                               "εκθ", "νετ", "ρον", "αρκ", "βαρ", "βολ",
                               "ωφελ"))):
            w += "ετ"
    return w


def _rule10(w):
    if len(w) > 5 and (_ew(w, "οντασ") or _ew(w, "ωντασ")):
        w = w[:-5]
        if len(w) == 3 and _ew(w, "αρχ"):
            w += "οντ"
        if _ew(w, "κρε"):
            w += "ωντ"
    return w


def _rule11(w):
    if len(w) > 6 and _ew(w, "ομαστε"):
        w = w[:-6]
        if len(w) == 2 and _ew(w, "ον"):
            w += "ομαστ"
    elif len(w) > 7 and _ew(w, "ιομαστε"):
        w = w[:-7]
        if len(w) == 2 and _ew(w, "ον"):
            w += "ομαστ"
    return w


def _rule12(w):
    if len(w) > 5 and _ew(w, "ιεστε"):
        w = w[:-5]
        if w in _EXC12A:
            w += "ιεστ"
    if len(w) > 4 and _ew(w, "εστε"):
        w = w[:-4]
        if w in _EXC12B:
            w += "εστ"
    return w


def _rule13(w):
    if len(w) > 6 and _ew(w, "ηθηκεσ"):
        w = w[:-6]
    elif len(w) > 5 and (_ew(w, "ηθηκα") or _ew(w, "ηθηκε")):
        w = w[:-5]
    removed = False
    if len(w) > 4 and _ew(w, "ηκεσ"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and (_ew(w, "ηκα") or _ew(w, "ηκε")):
        w = w[:-3]
        removed = True
    if removed and (w in _EXC13 or w.endswith(("σκωλ", "σκουλ", "ναρθ",
                                               "σφ", "οθ", "πιθ"))):
        w += "ηκ"
    return w


def _rule14(w):
    removed = False
    if len(w) > 5 and _ew(w, "ουσεσ"):
        w = w[:-5]
        removed = True
    elif len(w) > 4 and (_ew(w, "ουσα") or _ew(w, "ουσε")):
        w = w[:-4]
        removed = True
    if removed and (w in _EXC14 or _vowel(w)
                    or w.endswith(("ποδαρ", "βλεπ", "πανταχ", "φρυδ",
                                   "μαντιλ", "μαλλ", "κυματ", "λαχ", "ληγ",
                                   "φαγ", "ομ", "πρωτ"))):
        w += "ουσ"
    return w


def _rule15(w):
    removed = False
    if len(w) > 4 and _ew(w, "αγεσ"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and (_ew(w, "αγα") or _ew(w, "αγε")):
        w = w[:-3]
        removed = True
    if removed:
        cond1 = (w in _EXC15A
                 or w.endswith(("οφ", "πελ", "χορτ", "λλ", "σφ", "ρπ",
                                "φρ", "πρ", "λοχ", "σμην")))
        cond2 = w in _EXC15B or _ew(w, "κολλ")
        if cond1 and not cond2:
            w += "αγ"
    return w


def _rule16(w):
    removed = False
    if len(w) > 4 and _ew(w, "ησου"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and (_ew(w, "ησε") or _ew(w, "ησα")):
        w = w[:-3]
        removed = True
    if removed and w in _EXC16:
        w += "ησ"
    return w


def _rule17(w):
    if len(w) > 4 and _ew(w, "ηστε"):
        w = w[:-4]
        if w in _EXC17:
            w += "ηστ"
    return w


def _rule18(w):
    removed = False
    if len(w) > 6 and (_ew(w, "ησουνε") or _ew(w, "ηθουνε")):
        w = w[:-6]
        removed = True
    elif len(w) > 4 and _ew(w, "ουνε"):
        w = w[:-4]
        removed = True
    if removed and w in _EXC18:
        w += "ουν"
    return w


def _rule19(w):
    removed = False
    if len(w) > 6 and (_ew(w, "ησουμε") or _ew(w, "ηθουμε")):
        w = w[:-6]
        removed = True
    elif len(w) > 4 and _ew(w, "ουμε"):
        w = w[:-4]
        removed = True
    if removed and w in _EXC19:
        w += "ουμ"
    return w


def _rule20(w):
    if len(w) > 5 and (_ew(w, "ματων") or _ew(w, "ματοσ")):
        return w[:-3]
    if len(w) > 4 and _ew(w, "ματα"):
        return w[:-2]
    return w


_R21 = [
    (9, ["ιοντουσαν"], 9),
    (8, ["ιομασταν", "ιοσασταν", "ιουμαστε", "οντουσαν"], 8),
    (7, ["ιεμαστε", "ιεσαστε", "ιομουνα", "ιοσαστε", "ιοσουνα", "ιουνται",
         "ιουνταν", "ηθηκατε", "ομασταν", "οσασταν", "ουμαστε"], 7),
    (6, ["ιομουν", "ιονταν", "ιοσουν", "ηθειτε", "ηθηκαν", "ομουνα",
         "οσαστε", "οσουνα", "ουνται", "ουνταν", "ουσατε"], 6),
    (5, ["αγατε", "ιεμαι", "ιεται", "ιεσαι", "ιοταν", "ιουμα", "ηθεισ",
         "ηθουν", "ηκατε", "ησατε", "ησουν", "ομουν", "ονται", "ονταν",
         "οσουν", "ουμαι", "ουσαν"], 5),
    (4, ["αγαν", "αμαι", "ασαι", "αται", "ειτε", "εσαι", "εται", "ηδεσ",
         "ηδων", "ηθει", "ηκαν", "ησαν", "ησει", "ησεσ", "ομαι",
         "οταν"], 4),
    (3, ["αει", "εισ", "ηθω", "ησω", "ουν", "ουσ"], 3),
    (2, ["αν", "ασ", "αω", "ει", "εσ", "ησ", "οι", "οσ", "ου", "υσ",
         "ων"], 2),
]


def _rule21(w):
    for minlen, sufs, cut in _R21:
        if len(w) > minlen and w.endswith(tuple(sufs)):
            return w[:-cut]
    if len(w) > 1 and _vowel(w):
        return w[:-1]
    return w


def _rule22(w):
    if w.endswith(("εστερ", "εστατ")):
        return w[:-5]
    if w.endswith(("οτερ", "οτατ", "υτερ", "υτατ", "ωτερ", "ωτατ")):
        return w[:-4]
    return w


_RULES = [_rule0, _rule1, _rule2, _rule3, _rule4, _rule5, _rule6, _rule7,
          _rule8, _rule9, _rule10, _rule11, _rule12, _rule13, _rule14,
          _rule15, _rule16, _rule17, _rule18, _rule19, _rule20]


def greek_stem(word: str) -> str:
    """Exact GreekStemmer.stem(): expects greek_normalize()d input."""
    if len(word) < 4:
        return word
    orig = len(word)
    for rule in _RULES:
        word = rule(word)
    if len(word) == orig:          # nothing matched → the "long list"
        word = _rule21(word)
    return _rule22(word)
