"""HTMLStripCharFilter — the lucene/analysis/charfilter role, exact.

Re-implements the HTMLStripCharFilter.jflex state machine as a forward
scanner with the reference's decision procedure:

- entities (HTMLCharacterEntities.jflex): the HTML-4 named table with
  the uppercase variants QUOT/COPY/GT/LT/REG/AMP and the nbsp→' '
  mapping; numeric &#d;/&#xH; refs (dec ≤7 digits, hex ≤6; >0x10FFFF
  and over-long refs stay verbatim; lone surrogates become U+FFFD);
  the four paired-UTF-16-surrogate forms composed into one code point
  with the high/low range re-checks and single-'#' pushback on
  mismatch (jflex:327-505); a reference without ';' is verbatim
  mid-stream but substituted at EOF (%eof CHARACTER_REFERENCE_TAIL).
- tags: inline elements vanish, any other named tag becomes '\\n',
  BR becomes '\\n', <? ... [/?]> processing instructions vanish; the
  open-tag tail accepts on[event] attributes whose quoted values may
  contain < and >, server-side includes, and any non-angle chars
  (OpenTagContent, jflex:112-117); a '<' before the closing '>'
  inhibits tag recognition — the consumed prefix is emitted verbatim
  and scanning resumes (the shared [^] pushback fallback,
  jflex:917-925) — which reproduces every testMalformedHTML vector.
- <!...>: comments (incl. "<!---", server-side includes with quoted
  strings), <![CDATA[...]]> (content verbatim), other <!...> dropped;
  unterminated "<!..." is emitted verbatim (%eof BANG include),
  unterminated comments are dropped.
- <script>/<style>: content dropped to a single '\\n', with
  script/style comment handling (quoted strings, SSI); escaped
  SCRIPT/STYLE/BR keep their tags verbatim (content still dropped);
  other escaped tag names pass through whole.

Offset correction is not reproduced (this repo consumes the filter
for text cleaning; the JVM-regex `strip_html` column stays the scale
path). Every assertHTMLStripsTo vector in TestHTMLStripCharFilter is
pinned in tests/test_htmlstrip.py.
"""

from __future__ import annotations

import re

REPLACEMENT_CHARACTER = "�"

_UPPER_VARIANTS = {"quot": "QUOT", "copy": "COPY", "gt": "GT",
                   "lt": "LT", "reg": "REG", "amp": "AMP"}

_ENTITIES_LIST = [
    "AElig", "Æ", "Aacute", "Á", "Acirc", "Â",
    "Agrave", "À", "Alpha", "Α", "Aring", "Å",
    "Atilde", "Ã", "Auml", "Ä", "Beta", "Β",
    "Ccedil", "Ç", "Chi", "Χ", "Dagger", "‡",
    "Delta", "Δ", "ETH", "Ð", "Eacute", "É",
    "Ecirc", "Ê", "Egrave", "È", "Epsilon", "Ε",
    "Eta", "Η", "Euml", "Ë", "Gamma", "Γ",
    "Iacute", "Í", "Icirc", "Î", "Igrave", "Ì",
    "Iota", "Ι", "Iuml", "Ï", "Kappa", "Κ",
    "Lambda", "Λ", "Mu", "Μ", "Ntilde", "Ñ",
    "Nu", "Ν", "OElig", "Œ", "Oacute", "Ó",
    "Ocirc", "Ô", "Ograve", "Ò", "Omega", "Ω",
    "Omicron", "Ο", "Oslash", "Ø", "Otilde", "Õ",
    "Ouml", "Ö", "Phi", "Φ", "Pi", "Π",
    "Prime", "″", "Psi", "Ψ", "Rho", "Ρ",
    "Scaron", "Š", "Sigma", "Σ", "THORN", "Þ",
    "Tau", "Τ", "Theta", "Θ", "Uacute", "Ú",
    "Ucirc", "Û", "Ugrave", "Ù", "Upsilon", "Υ",
    "Uuml", "Ü", "Xi", "Ξ", "Yacute", "Ý",
    "Yuml", "Ÿ", "Zeta", "Ζ", "aacute", "á",
    "acirc", "â", "acute", "´", "aelig", "æ",
    "agrave", "à", "alefsym", "ℵ", "alpha", "α",
    "amp", "&", "and", "∧", "ang", "∠",
    "apos", "'", "aring", "å", "asymp", "≈",
    "atilde", "ã", "auml", "ä", "bdquo", "„",
    "beta", "β", "brvbar", "¦", "bull", "•",
    "cap", "∩", "ccedil", "ç", "cedil", "¸",
    "cent", "¢", "chi", "χ", "circ", "ˆ",
    "clubs", "♣", "cong", "≅", "copy", "©",
    "crarr", "↵", "cup", "∪", "curren", "¤",
    "dArr", "⇓", "dagger", "†", "darr", "↓",
    "deg", "°", "delta", "δ", "diams", "♦",
    "divide", "÷", "eacute", "é", "ecirc", "ê",
    "egrave", "è", "empty", "∅", "emsp", " ",
    "ensp", " ", "epsilon", "ε", "equiv", "≡",
    "eta", "η", "eth", "ð", "euml", "ë",
    "euro", "€", "exist", "∃", "fnof", "ƒ",
    "forall", "∀", "frac12", "½", "frac14", "¼",
    "frac34", "¾", "frasl", "⁄", "gamma", "γ",
    "ge", "≥", "gt", ">", "hArr", "⇔",
    "harr", "↔", "hearts", "♥", "hellip", "…",
    "iacute", "í", "icirc", "î", "iexcl", "¡",
    "igrave", "ì", "image", "ℑ", "infin", "∞",
    "int", "∫", "iota", "ι", "iquest", "¿",
    "isin", "∈", "iuml", "ï", "kappa", "κ",
    "lArr", "⇐", "lambda", "λ", "lang", "〈",
    "laquo", "«", "larr", "←", "lceil", "⌈",
    "ldquo", "“", "le", "≤", "lfloor", "⌊",
    "lowast", "∗", "loz", "◊", "lrm", "‎",
    "lsaquo", "‹", "lsquo", "‘", "lt", "<",
    "macr", "¯", "mdash", "—", "micro", "µ",
    "middot", "·", "minus", "−", "mu", "μ",
    "nabla", "∇", "nbsp", " ", "ndash", "–",
    "ne", "≠", "ni", "∋", "not", "¬",
    "notin", "∉", "nsub", "⊄", "ntilde", "ñ",
    "nu", "ν", "oacute", "ó", "ocirc", "ô",
    "oelig", "œ", "ograve", "ò", "oline", "‾",
    "omega", "ω", "omicron", "ο", "oplus", "⊕",
    "or", "∨", "ordf", "ª", "ordm", "º",
    "oslash", "ø", "otilde", "õ", "otimes", "⊗",
    "ouml", "ö", "para", "¶", "part", "∂",
    "permil", "‰", "perp", "⊥", "phi", "φ",
    "pi", "π", "piv", "ϖ", "plusmn", "±",
    "pound", "£", "prime", "′", "prod", "∏",
    "prop", "∝", "psi", "ψ", "quot", "\"",
    "rArr", "⇒", "radic", "√", "rang", "〉",
    "raquo", "»", "rarr", "→", "rceil", "⌉",
    "rdquo", "”", "real", "ℜ", "reg", "®",
    "rfloor", "⌋", "rho", "ρ", "rlm", "‏",
    "rsaquo", "›", "rsquo", "’", "sbquo", "‚",
    "scaron", "š", "sdot", "⋅", "sect", "§",
    "shy", "­", "sigma", "σ", "sigmaf", "ς",
    "sim", "∼", "spades", "♠", "sub", "⊂",
    "sube", "⊆", "sum", "∑", "sup", "⊃",
    "sup1", "¹", "sup2", "²", "sup3", "³",
    "supe", "⊇", "szlig", "ß", "tau", "τ",
    "there4", "∴", "theta", "θ", "thetasym", "ϑ",
    "thinsp", " ", "thorn", "þ", "tilde", "˜",
    "times", "×", "trade", "™", "uArr", "⇑",
    "uacute", "ú", "uarr", "↑", "ucirc", "û",
    "ugrave", "ù", "uml", "¨", "upsih", "ϒ",
    "upsilon", "υ", "uuml", "ü", "weierp", "℘",
    "xi", "ξ", "yacute", "ý", "yen", "¥",
    "yuml", "ÿ", "zeta", "ζ", "zwj", "‍",
    "zwnj", "‌",
]

ENTITY_VALUES: dict[str, str] = {}
for _i in range(0, len(_ENTITIES_LIST), 2):
    _name, _val = _ENTITIES_LIST[_i], _ENTITIES_LIST[_i + 1]
    ENTITY_VALUES[_name] = _val
    _uv = _UPPER_VARIANTS.get(_name)
    if _uv is not None:
        ENTITY_VALUES[_uv] = _val

_ENTITY_RX = re.compile("|".join(
    sorted((re.escape(k) for k in ENTITY_VALUES), key=len,
           reverse=True)))

_INLINE = frozenset(
    "a b i q s u abbr acronym basefont bdo big cite code dfn em font "
    "img input kbd label samp select small span strike strong sub sup "
    "textarea tt var".split())

_EVENTS = ("abort blur change click dblclick error focus keydown "
           "keypress keyup load mousedown mousemove mouseout mouseover "
           "mouseup reset select submit unload")
_SQ = r"'(?:\\'|[^'])*'"
_DQ = r"\"(?:\\\"|[^\"])*\""
_SSI = rf"<!--#(?:[^'\"]|{_SQ}|{_DQ})*-->"
_EVENT_ATTR = (r"[oO][nN](?:"
               + "|".join("".join(f"[{c}{c.upper()}]" for c in w)
                          for w in _EVENTS.split())
               + rf")\s*=\s*(?:{_SQ}|{_DQ})")
_OTC = rf"(?:{_EVENT_ATTR}|[^<>]|{_SSI})*"
_TAIL = rf"(?:(?:=\s*|\s+){_OTC})?\s*/?>"

# Name = [:_\p{ID_Start}] [-.:_\p{ID_Continue}]* (jflex:70) -
# ID_Start approximated as any Unicode letter, ID_Continue via \w
_NAME = r"(?:[:_]|[^\W\d_])[-.:\w]*"
_NAME_RX = re.compile(_NAME)
_INLINE_RX = re.compile(
    "|".join(sorted(( "".join(f"[{c}{c.upper()}]" for c in t)
                      for t in _INLINE), key=len, reverse=True)))
_BR_OPEN_RX = re.compile(rf"\s*[bB][rR]{_TAIL}")
_SCRIPT_OPEN_RX = re.compile(
    rf"\s*[sS][cC][rR][iI][pP][tT](?:\s+{_OTC})?\s*>")
_STYLE_OPEN_RX = re.compile(rf"\s*[sS][tT][yY][lL][eE](?:\s+{_OTC})?\s*>")
_PI_RX = re.compile(r"\?[^>]*[/?]>")
_NAME_PREFIX_RX = re.compile(rf"(\s*)({_NAME})")
_TAIL_RX = re.compile(_TAIL)
_CLOSE_BR_RX = re.compile(r"[bB][rR]\s*>")
_CLOSE_TAIL_RX = re.compile(r"\s*>")
_SCRIPT_CLOSE_RX = re.compile(r"</\s*[sS][cC][rR][iI][pP][tT]\s*>")
_STYLE_CLOSE_RX = re.compile(r"</\s*[sS][tT][yY][lL][eE]\s*>")

# paired UTF-16 surrogate character references (jflex:351-505)
_SURR_HH = re.compile(
    r"#[xX]([dD][89aAbB][0-9a-fA-F]{2});&#[xX]([dD][c-fC-F][0-9a-fA-F]{2});")
_SURR_DH = re.compile(r"#(5[56]\d{3});&#[xX]([dD][c-fC-F][0-9a-fA-F]{2});")
_SURR_HD = re.compile(r"#[xX]([dD][89aAbB][0-9a-fA-F]{2});&#(5[67]\d{3});")
_SURR_DD = re.compile(r"#(5[56]\d{3});&#(5[67]\d{3});")
_HEX_REF = re.compile(r"[xX]([0-9A-Fa-f]+)")
_DEC_REF = re.compile(r"([0-9]+)")


class _Stripper:
    def __init__(self, text: str, escaped_tags=None):
        self.s = text
        self.out: list[str] = []
        esc = {t.lower() for t in (escaped_tags or ())}
        self.escape_br = "br" in esc
        self.escape_script = "script" in esc
        self.escape_style = "style" in esc
        self.escaped = esc - {"br", "script", "style"}

    # ---- entities --------------------------------------------------

    def _amp(self, i: int) -> int:
        s, n = self.s, len(self.s)
        j = i + 1
        # paired surrogates first (longest rules in AMPERSAND)
        for rx, high_hex, low_hex in ((_SURR_HH, True, True),
                                      (_SURR_DH, False, True),
                                      (_SURR_HD, True, False),
                                      (_SURR_DD, False, False)):
            m = rx.match(s, j)
            if m is not None:
                hi = int(m.group(1), 16 if high_hex else 10)
                lo = int(m.group(2), 16 if low_hex else 10)
                if 0xD800 <= hi <= 0xDBFF and 0xDC00 <= lo <= 0xDFFF:
                    cp = 0x10000 + ((hi - 0xD800) << 10) + (lo - 0xDC00)
                    self.out.append(chr(cp))
                    return m.end()
                # range check failed: consume only "&#" and process the
                # first reference as a plain numeric ref (yypushback)
                break
        m = _ENTITY_RX.match(s, j)
        if m is not None:
            value = ENTITY_VALUES[m.group(0)]
            k = m.end()
            if k < n and s[k] == ";":
                self.out.append(value)
                return k + 1
            if k >= n:                  # EOF: semicolon optional
                self.out.append(value)
                return k
            self.out.append(s[i:k])     # no ';': verbatim
            return k
        if j < n and s[j] == "#":
            return self._numeric(i, j + 1)
        self.out.append("&")
        return j

    def _numeric(self, amp: int, j: int) -> int:
        s, n = self.s, len(self.s)
        for rx, base, max_len in ((_HEX_REF, 16, 7), (_DEC_REF, 10, 7)):
            m = rx.match(s, j)
            if m is None:
                continue
            digits = m.group(1)
            k = m.end()
            limit = 6 if base == 16 else 7
            if len(digits) > limit:
                self.out.append(s[amp:k])       # over-long: verbatim
                return k
            cp = int(digits, base)
            if cp > 0x10FFFF:
                self.out.append(s[amp:k])
                return k
            value = (REPLACEMENT_CHARACTER
                     if 0xD800 <= cp <= 0xDFFF else chr(cp))
            if k < n and s[k] == ";":
                self.out.append(value)
                return k + 1
            if k >= n:                  # EOF tail substitution
                self.out.append(value)
                return k
            self.out.append(s[amp:k])   # no ';' mid-stream: verbatim
            return k
        self.out.append(s[amp:j])       # bare "&#"
        return j

    # ---- tags ------------------------------------------------------

    def _is_escaped(self, name: str) -> bool:
        return name.lower() in self.escaped

    def _lt(self, i: int) -> int:
        s, n = self.s, len(self.s)
        j = i + 1
        if j >= n:
            self.out.append("<")
            return j
        c = s[j]
        if c == "!":
            return self._bang(i, j + 1)
        if c == "/":
            return self._close(i, j + 1)
        if c == "?":
            m = _PI_RX.match(s, j)
            if m is not None:
                return m.end()
            self.out.append("<")
            return j
        # candidates, jflex rule order: br, script, style, then name
        candidates = []
        m = _BR_OPEN_RX.match(s, j)
        if m is not None:
            candidates.append((m.end() - j, 0, m))
        m = _SCRIPT_OPEN_RX.match(s, j)
        if m is not None:
            candidates.append((m.end() - j, 1, m))
        m = _STYLE_OPEN_RX.match(s, j)
        if m is not None:
            candidates.append((m.end() - j, 2, m))
        nm = _NAME_PREFIX_RX.match(s, j)
        inline_name = None
        if nm is not None:
            im = _INLINE_RX.match(s, nm.start(2))
            if im is not None and im.end() == nm.end(2):
                inline_name = im.group(0)
            candidates.append((nm.end(2) - j, 3, nm))
        if not candidates:
            self.out.append("<")
            return j
        candidates.sort(key=lambda t: (-t[0], t[1]))
        length, kind, m = candidates[0]
        if kind == 0:                   # <br ...>
            if self.escape_br:
                self.out.append(s[i:m.end()])
            else:
                self.out.append("\n")
            return m.end()
        if kind == 1:                   # <script ...>
            if self.escape_script:
                self.out.append(s[i:m.end()])
            return self._script_or_style(m.end(), _SCRIPT_CLOSE_RX,
                                         self.escape_script)
        if kind == 2:                   # <style ...>
            if self.escape_style:
                self.out.append(s[i:m.end()])
            return self._script_or_style(m.end(), _STYLE_CLOSE_RX,
                                         self.escape_style)
        name = m.group(2)
        after_name = m.end(2)
        tail = _TAIL_RX.match(s, after_name)
        if tail is None:
            # '<' before '>' (or EOF): emit the consumed prefix
            # verbatim and rescan (the [^] pushback fallback)
            self.out.append(s[i:after_name])
            return after_name
        if self._is_escaped(name):
            self.out.append(s[i:tail.end()])
        elif inline_name is not None and len(inline_name) == len(name):
            pass                        # inline: vanishes
        else:
            self.out.append("\n")
        return tail.end()

    def _close(self, i: int, j: int) -> int:
        s, n = self.s, len(self.s)
        k = j
        while k < n and s[k].isspace():
            k += 1
        m = _CLOSE_BR_RX.match(s, k)
        nm = _NAME_RX.match(s, k)
        br_len = m.end() - k if m is not None else -1
        name_len = nm.end() - k if nm is not None else -1
        if m is not None and br_len >= name_len:
            if self.escape_br:
                self.out.append(s[i:m.end()])
            else:
                self.out.append("\n")
            return m.end()
        if nm is None:
            self.out.append(s[i:k])
            return k
        name = nm.group(0)
        im = _INLINE_RX.match(s, k)
        is_inline = im is not None and im.end() == nm.end()
        tail = _CLOSE_TAIL_RX.match(s, nm.end())
        if tail is None:
            self.out.append(s[i:nm.end()])
            return nm.end()
        if self._is_escaped(name):
            self.out.append(s[i:tail.end()])
        elif is_inline:
            pass
        else:
            self.out.append("\n")
        return tail.end()

    def _bang(self, i: int, j: int) -> int:
        s, n = self.s, len(self.s)
        k = j
        acc_empty = True
        while k < n:
            if s.startswith("--", k) and acc_empty:
                return self._comment(k + 2)
            if s[k] == ">":
                return k + 1            # <!...> dropped
            if s.startswith("[CDATA[", k) and acc_empty:
                return self._cdata(k + 7)
            acc_empty = False
            k += 1
        self.out.append(s[i:])          # EOF in BANG: include verbatim
        return n

    def _cdata(self, j: int) -> int:
        s, n = self.s, len(self.s)
        end = s.find("]]>", j)
        if end < 0:
            self.out.append(s[j:])      # EOF: content stays
            return n
        self.out.append(s[j:end])
        return end + 3

    def _comment(self, j: int) -> int:
        s, n = self.s, len(self.s)
        k = j
        while k < n:
            if s.startswith("<!--#", k):
                k = self._ssi(k + 5)
            elif s.startswith("-->", k):
                return k + 3
            else:
                k += 1
        return n                        # unterminated comment: dropped

    def _ssi(self, j: int) -> int:
        s, n = self.s, len(self.s)
        k = j
        while k < n:
            if s.startswith("-->", k):
                return k + 3
            if s[k] in "'\"":
                k = self._quoted(k + 1, s[k])
            else:
                k += 1
        return n

    def _quoted(self, j: int, quote: str) -> int:
        s, n = self.s, len(self.s)
        k = j
        while k < n:
            if s[k] == "\\" and k + 1 < n:
                k += 2
            elif s[k] == quote:
                return k + 1
            else:
                k += 1
        return n

    def _script_or_style(self, j: int, close_rx, escaped: bool) -> int:
        s, n = self.s, len(self.s)
        k = j
        while k < n:
            if s.startswith("<!--", k):
                k = self._script_comment(k + 4)
                continue
            m = close_rx.match(s, k)
            if m is not None:
                if escaped:
                    self.out.append(s[k:m.end()])
                else:
                    self.out.append("\n")
                return m.end()
            k += 1
        return n                        # EOF: content dropped, no \n

    def _script_comment(self, j: int) -> int:
        s, n = self.s, len(self.s)
        k = j
        while k < n:
            if s.startswith("<!--#", k):
                k = self._ssi(k + 5)
            elif s.startswith("-->", k):
                return k + 3
            elif s[k] in "'\"":
                k = self._quoted(k + 1, s[k])
            else:
                k += 1
        return n

    # ---- driver ----------------------------------------------------

    def run(self) -> str:
        s, n = self.s, len(self.s)
        i = 0
        while i < n:
            c = s[i]
            if c == "&":
                i = self._amp(i)
            elif c == "<":
                i = self._lt(i)
            else:
                self.out.append(c)
                i += 1
        return "".join(self.out)


def html_strip(text: str, escaped_tags=None) -> str:
    """Strip HTML from `text` with the reference filter's semantics."""
    return _Stripper(text, escaped_tags).run()
