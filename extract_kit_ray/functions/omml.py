"""OMML (Office Math Markup Language) -> LaTeX, regex-for-regex.

Port of the reference's regex-based converter
(packages/office-to-markdown/src/math/omml-processor.ts:43-192) with the
exact pattern ORDER preserved — including the documented quirk that the
nth-root pattern (applied after the square-root pattern) never fires,
because the square-root pattern at omml-processor.ts:118-121 already
consumes every ``<rad>`` element first.  Reproducing the quirk keeps
outputs bit-identical with the reference's behavior.
"""

from __future__ import annotations

import re

UNICODE_TO_LATEX = {
    # Greek letters (omml-processor.ts:45-50)
    "α": "\\alpha", "β": "\\beta", "γ": "\\gamma", "δ": "\\delta",
    "ε": "\\epsilon", "ζ": "\\zeta", "η": "\\eta", "θ": "\\theta",
    "ι": "\\iota", "κ": "\\kappa", "λ": "\\lambda", "μ": "\\mu",
    "ν": "\\nu", "ξ": "\\xi", "π": "\\pi", "ρ": "\\rho",
    "σ": "\\sigma", "τ": "\\tau", "υ": "\\upsilon", "φ": "\\phi",
    "χ": "\\chi", "ψ": "\\psi", "ω": "\\omega",
    # Math symbols (omml-processor.ts:53-57)
    "∞": "\\infty", "±": "\\pm", "∓": "\\mp", "≤": "\\leq", "≥": "\\geq",
    "≠": "\\neq", "≈": "\\approx", "∈": "\\in", "∉": "\\notin",
    "∪": "\\cup", "∩": "\\cap", "∑": "\\sum", "∏": "\\prod",
    "∫": "\\int", "√": "\\sqrt", "→": "\\rightarrow", "←": "\\leftarrow",
    "↔": "\\leftrightarrow",
}

# Pattern order matters and is preserved exactly (omml-processor.ts:102-133).
OMML_PATTERNS: list[tuple[re.Pattern[str], str]] = [
    # Fractions: <f><num>a</num><den>b</den></f> -> \frac{a}{b}
    (re.compile(r"<f>[\s\S]*?<num>(.*?)</num>[\s\S]*?<den>(.*?)</den>[\s\S]*?</f>"),
     r"\\frac{\1}{\2}"),
    # Superscripts
    (re.compile(r"<sSup>[\s\S]*?<e>(.*?)</e>[\s\S]*?<sup>(.*?)</sup>[\s\S]*?</sSup>"),
     r"\1^{\2}"),
    # Subscripts
    (re.compile(r"<sSub>[\s\S]*?<e>(.*?)</e>[\s\S]*?<sub>(.*?)</sub>[\s\S]*?</sSub>"),
     r"\1_{\2}"),
    # Square roots (consumes every <rad>, shadowing the nth-root rule below)
    (re.compile(r"<rad>[\s\S]*?<e>(.*?)</e>[\s\S]*?</rad>"), r"\\sqrt{\1}"),
    # Nth roots (dead in practice — kept for reference parity)
    (re.compile(r"<rad>[\s\S]*?<deg>(.*?)</deg>[\s\S]*?<e>(.*?)</e>[\s\S]*?</rad>"),
     r"\\sqrt[\1]{\2}"),
    # Text runs
    (re.compile(r"<r>[\s\S]*?<t>(.*?)</t>[\s\S]*?</r>"), r"\1"),
]

_NS_PREFIX = re.compile(r"[a-zA-Z]+:")
_ANY_TAG = re.compile(r"<[^>]*>")
_WS = re.compile(r"\s+")


def replace_unicode_symbols(text: str) -> str:
    """Unicode math symbols -> LaTeX commands, each followed by a space
    (exact reference behavior, omml-processor.ts:76-82)."""
    for unicode_ch, latex in UNICODE_TO_LATEX.items():
        text = text.replace(unicode_ch, latex + " ")
    return text


def convert_omml_to_latex(omml_xml: str) -> str:
    """OMML XML -> LaTeX (omml-processor.ts:166-192). Never raises."""
    try:
        latex = omml_xml
        latex = _NS_PREFIX.sub("", latex)
        for pattern, replacement in OMML_PATTERNS:
            latex = pattern.sub(replacement, latex)
        latex = _ANY_TAG.sub(" ", latex)
        latex = replace_unicode_symbols(latex)
        return _WS.sub(" ", latex).strip()
    except Exception:
        return _WS.sub(" ", _ANY_TAG.sub(" ", omml_xml)).strip()


# ---------------------------------------------------------------------------
# DOCX XML math preprocessing (docx-preprocessor.ts:53-82)
# ---------------------------------------------------------------------------

_OMATH_PARA = re.compile(r"<(m:)?oMathPara[^>]*>([\s\S]*?)</(m:)?oMathPara>", re.I)
_OMATH = re.compile(r"<(m:)?oMath[^>]*>([\s\S]*?)</(m:)?oMath>", re.I)


def _latex_text_run(latex: str, is_block: bool) -> str:
    delim = "$$" if is_block else "$"
    return f"<w:r><w:t>{delim}{latex}{delim}</w:t></w:r>"


def preprocess_math_xml(xml_content: str) -> str:
    """Replace OMML math in a WordprocessingML XML string with LaTeX text
    runs: block (``$$..$$``) for ``oMathPara``, inline (``$..$``) for bare
    ``oMath`` (docx-preprocessor.ts:53-82)."""

    def para_repl(match: re.Match[str]) -> str:
        math_content = match.group(2)
        omaths = _OMATH.findall(math_content)
        if omaths:
            # findall returns groups; re-find full matches for conversion
            full = [m.group(0) for m in _OMATH.finditer(math_content)]
            runs = [_latex_text_run(convert_omml_to_latex(m), True) for m in full]
            return "<w:p>" + "".join(runs) + "</w:p>"
        return match.group(0)

    content = _OMATH_PARA.sub(para_repl, xml_content)
    content = _OMATH.sub(
        lambda m: _latex_text_run(convert_omml_to_latex(m.group(0)), False), content
    )
    return content
