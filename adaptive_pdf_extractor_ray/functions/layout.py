"""Layout-grid extraction over positional text runs.

The reference's real scanned-card PDFs render labels as a detached
header row with the values grouped on the line below, x-aligned by
column ("Seccional Inscrição Subseção" / "PR 101943 CONSELHO ..."),
which is exactly the case its linear text path cannot handle and it
paid an LLM for (reference `data/real/*.pdf`; schema descriptions in
`data/real/dataset.json` explicitly say "canto superior esquerdo",
"canto inferior direito"). This module extracts those layouts
deterministically from the `(y, x, text)` runs that
``sources/pdfio.py:parse_pdf_runs`` produces:

1. **Grid rule** — a run whose folded text equals a label marks a
   column header; value runs on the first non-label line below (within
   ``y_band``) are assigned to the nearest label column by x distance.
2. **Inline rule** — a run whose folded text *starts with* a label
   (plus ':' etc.) carries its value in the same run.
3. **Enum rule** (optional) — an unlabeled run whose folded text equals
   one of a field's known candidate values claims that field
   (e.g. categoria ∈ {ADVOGADO, SUPLEMENTAR, ...}).
4. **Headline rule** (optional) — the topmost still-unassigned text run
   is the given field (e.g. nome, "canto superior esquerdo").

All rules are pure functions of the run list — deterministic,
order-free, and cheap (no model, no fit wave needed).
"""

from __future__ import annotations

import unicodedata

LINE_TOL = 2.5  # max y delta within one visual line
Y_BAND = 60.0  # max y drop from a label line to its value line
CHAR_W = 2.5  # half of the estimated glyph advance (~10pt body text);
# used to approximate a run's horizontal CENTER (x + CHAR_W * len) so
# right-aligned numeric columns land on the right header even when
# their x-start drifts toward the next column


def fold(s: str) -> str:
    """Accent-insensitive casefold for label/enum matching
    ("Inscrição" == "Inscricao"); trailing ':' and whitespace dropped."""
    nfd = unicodedata.normalize("NFD", s)
    stripped = "".join(c for c in nfd if not unicodedata.combining(c))
    return stripped.casefold().strip().rstrip(":").strip()


def _fold_char(c: str) -> str:
    nfd = unicodedata.normalize("NFD", c)
    return "".join(ch for ch in nfd if not unicodedata.combining(ch)).casefold()


def _fold_cut(raw: str, folded_prefix: str) -> int | None:
    """Index into ``raw`` where its fold first covers ``folded_prefix``.

    ``len(folded_prefix)`` is NOT a valid cut into raw: fold() changes
    string length for NFD-decomposed accents (combining marks dropped)
    and casefold expansions (ß -> ss). Scanning raw and folding
    incrementally keeps the cut aligned to original characters."""
    acc = ""
    for i, ch in enumerate(raw):
        acc += _fold_char(ch)
        if acc == folded_prefix:
            return i + 1
        if len(acc) >= len(folded_prefix) and not folded_prefix.startswith(acc):
            return None
    return None


def _lines(runs: list[tuple[float, float, str]]):
    """Group (y, x, text) runs into visual lines (desc y, asc x)."""
    out: list[list[tuple[float, float, str]]] = []
    last_y: float | None = None
    for y, x, txt in sorted(runs, key=lambda r: (-r[0], r[1])):
        if not txt.strip():
            continue
        if last_y is None or abs(y - last_y) > LINE_TOL:
            out.append([])
            last_y = y
        out[-1].append((y, x, txt))
    return out


def grid_extract(
    runs: list[tuple[float, float, str]],
    labels: dict[str, str],
    *,
    enums: dict[str, list[str]] | None = None,
    headline_field: str | None = None,
    y_band: float = Y_BAND,
    max_col_dist: float = 60.0,
) -> dict[str, str | None]:
    """Extract ``{field: value | None}`` from positional runs.

    ``labels`` maps field name -> its rendered label ("inscricao" ->
    "Inscrição" or "Inscricao" — matching is accent/case-insensitive).
    Every field in ``labels`` whose label occurs appears in the result
    (None when the label has no value — the omitted-field protocol);
    enum / headline fields appear only when matched. First occurrence in
    reading order wins for repeated labels.
    """
    by_fold = {fold(lab): f for f, lab in labels.items()}
    enum_folds = {
        f: {fold(v) for v in vals} for f, vals in (enums or {}).items()
    }
    # a run that IS a known enum value is a value, never an inline
    # "Label: value" carrier ("SITUAÇÃO REGULAR" is the whole value of
    # situacao, not label "Situacao" + value "REGULAR")
    all_enum_folds = {v for folds in enum_folds.values() for v in folds}
    lines = _lines(runs)

    out: dict[str, str | None] = {}
    assigned: set[tuple[float, float]] = set()  # (y, x) of consumed runs

    # pass 1: label runs (grid headers) + inline "Label: value" runs
    label_sites: list[tuple[int, float, str]] = []  # (line_idx, x, field)
    for li, line in enumerate(lines):
        for y, x, txt in line:
            fd = fold(txt)
            field = by_fold.get(fd)
            if field is not None:
                assigned.add((y, x))
                if field not in out:
                    label_sites.append((li, x, field))
                    out.setdefault(field, None)
                continue
            if fd in all_enum_folds:
                continue  # whole run is a known enum VALUE
            # inline: run starts with a label, remainder is the value
            for lf, f in by_fold.items():
                if fd.startswith(lf) and len(fd) > len(lf) and f not in out:
                    raw = txt.strip()
                    # fold-aligned cut into the ORIGINAL text (len(lf)
                    # misaligns when fold changed lengths: NFD accents
                    # drop combining marks, casefold expands eszett)
                    cut = _fold_cut(raw, lf)
                    if cut is None:
                        continue
                    # strip whitespace/nbsp and at most ONE ':' separator
                    # (a blanket lstrip would eat legitimate leading ':'
                    # characters of the value itself)
                    rest = raw[cut:].lstrip(" \t\u00a0")
                    if rest.startswith(":"):
                        rest = rest[1:].lstrip(" \t\u00a0")
                    if not rest:
                        continue
                    out[f] = rest
                    assigned.add((y, x))
                    break

    # pass 2: grid values — nearest label column (by estimated run
    # CENTER) on the first non-label line below each label line
    label_text = {f: lab for f, lab in labels.items()}

    def center(x: float, txt: str) -> float:
        return x + CHAR_W * len(txt)

    for li, lx, field in label_sites:
        if out.get(field) is not None:
            continue
        label_y = lines[li][0][0]
        sites_here = [
            (center(x2, label_text[f2]), f2)
            for l2, x2, f2 in label_sites if l2 == li
        ]
        for line in lines[li + 1 :]:
            ly = line[0][0]
            if label_y - ly > y_band:
                break
            cands = [(y, x, t) for y, x, t in line if (y, x) not in assigned
                     and fold(t) not in by_fold]
            if not cands:
                continue
            picked = []
            for y, x, t in cands:
                near = min(sites_here, key=lambda s: abs(s[0] - center(x, t)))
                if near[1] == field and abs(near[0] - center(x, t)) <= max_col_dist:
                    picked.append((x, t))
            if picked:
                for y, x, t in cands:
                    if any(px == x and pt == t for px, pt in picked):
                        assigned.add((y, x))
                out[field] = " ".join(t.strip() for _, t in sorted(picked))
            break  # only the first value line below counts

    # pass 3: enum fields — an unassigned run equal to a known candidate
    for f, folds in enum_folds.items():
        if out.get(f) is not None:
            continue
        for line in lines:
            for y, x, txt in line:
                if (y, x) in assigned:
                    continue
                if fold(txt) in folds:
                    out[f] = txt.strip()
                    assigned.add((y, x))
                    break
            if out.get(f) is not None:
                break

    # pass 4: headline — topmost unassigned run
    if headline_field and out.get(headline_field) is None:
        for line in lines:
            pick = [(y, x, t) for y, x, t in line if (y, x) not in assigned]
            if pick:
                y, x, t = pick[0]
                out[headline_field] = t.strip()
                assigned.add((y, x))
                break

    return out
