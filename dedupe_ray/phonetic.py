"""Double Metaphone (Lawrence Philips, Dr. Dobb's Journal, June 2000).

Public-domain phonetic algorithm, re-implemented from the published rule
set. This is the exact algorithm behind the reference library's
``doubleMetaphone`` predicates ([lib: dedupe/predicates.py
metaphoneToken], which calls the ``doublemetaphone`` C extension — not
installable in this environment, so the rules are ported here).

Unlike classic Metaphone (``_metaphone_one`` in predicates.py, kept for
settings compatibility), Double Metaphone emits a primary AND an
alternate code so Slavic / Germanic / Romance spellings of the same name
collide: Smith↔Schmidt (XMT), Wasserman↔Vasserman (FSRMN),
Filipowicz↔Filipowitz (FLPTS/FLPFX).

The input here is always a single token (the predicates apply per word),
so the original's phrase-level checks ("VAN ", "SAN ") can only match via
the end-of-word padding, mirroring the per-token behavior of the
reference's predicate layer.
"""

from __future__ import annotations

import re

_ALPHA = re.compile(r"[^A-Z]")
_VOWELS = frozenset("AEIOUY")


def double_metaphone(word: str) -> tuple[str, str]:
    """Return (primary, secondary) codes; secondary may equal primary.

    Full-length codes (no 4-char truncation) — longer codes make more
    selective block keys, matching the behavior of the C extension the
    reference library links against.
    """
    w = _ALPHA.sub("", word.upper())
    length = len(w)
    if length == 0:
        return "", ""
    last = length - 1
    padded = w + "     "
    slavo = ("W" in w) or ("K" in w) or ("CZ" in w) or ("WITZ" in w)
    pri: list[str] = []
    sec: list[str] = []

    def add(p: str, s: str | None = None) -> None:
        pri.append(p)
        sec.append(p if s is None else s)

    def char_at(i: int) -> str:
        return padded[i] if i >= 0 else ""

    def string_at(start: int, size: int, *options: str) -> bool:
        if start < 0:
            return False
        return padded[start : start + size] in options

    def is_vowel(i: int) -> bool:
        return 0 <= i < length and w[i] in _VOWELS

    current = 0
    if w[0:2] in ("GN", "KN", "PN", "WR", "PS"):
        current = 1
    if w[0] == "X":
        add("S")
        current = 1

    while current < length:
        c = w[current]
        if c in _VOWELS:
            if current == 0:
                add("A")
            current += 1
        elif c == "B":
            add("P")
            current += 2 if char_at(current + 1) == "B" else 1
        elif c == "C":
            # germanic 'ACH' that is not 'BACHER'/'MACHER' softening
            if (
                current > 1
                and not is_vowel(current - 2)
                and string_at(current - 1, 3, "ACH")
                and (
                    char_at(current + 2) != "I"
                    and (
                        char_at(current + 2) != "E"
                        or string_at(current - 2, 6, "BACHER", "MACHER")
                    )
                )
            ):
                add("K")
                current += 2
            elif current == 0 and string_at(current, 6, "CAESAR"):
                add("S")
                current += 2
            elif string_at(current, 4, "CHIA"):  # italian 'chianti'
                add("K")
                current += 2
            elif string_at(current, 2, "CH"):
                if current > 0 and string_at(current, 4, "CHAE"):  # 'michael'
                    add("K", "X")
                    current += 2
                elif (
                    current == 0
                    and (
                        string_at(current + 1, 5, "HARAC", "HARIS")
                        or string_at(current + 1, 3, "HOR", "HYM", "HIA", "HEM")
                    )
                    and not string_at(0, 5, "CHORE")
                ):  # greek roots: 'chemistry', 'chorus'
                    add("K")
                    current += 2
                elif (
                    string_at(0, 4, "VAN ", "VON ")
                    or string_at(0, 3, "SCH")
                    or string_at(current - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
                    or string_at(current + 2, 1, "T", "S")
                    or (
                        (string_at(current - 1, 1, "A", "O", "U", "E") or current == 0)
                        and string_at(
                            current + 2, 1,
                            "L", "R", "N", "M", "B", "H", "F", "V", "W", " ",
                        )
                    )
                ):  # germanic / 'kh' sound
                    add("K")
                    current += 2
                else:
                    if current > 0:
                        if string_at(0, 2, "MC"):  # 'McHugh'
                            add("K")
                        else:
                            add("X", "K")
                    else:
                        add("X")
                    current += 2
            elif string_at(current, 2, "CZ") and not string_at(current - 2, 4, "WICZ"):
                add("S", "X")  # 'czerny'
                current += 2
            elif string_at(current + 1, 3, "CIA"):  # 'focaccia'
                add("X")
                current += 3
            elif string_at(current, 2, "CC") and not (current == 1 and w[0] == "M"):
                # double 'C' but not 'McClellan'
                if string_at(current + 2, 1, "I", "E", "H") and not string_at(
                    current + 2, 2, "HU"
                ):
                    if (current == 1 and char_at(current - 1) == "A") or string_at(
                        current - 1, 5, "UCCEE", "UCCES"
                    ):  # 'accident', 'succeed'
                        add("KS")
                    else:  # 'bacci', 'bertucci'
                        add("X")
                    current += 3
                else:  # Pierce's rule
                    add("K")
                    current += 2
            elif string_at(current, 2, "CK", "CG", "CQ"):
                add("K")
                current += 2
            elif string_at(current, 2, "CI", "CE", "CY"):
                if string_at(current, 3, "CIO", "CIE", "CIA"):  # italian vs english
                    add("S", "X")
                else:
                    add("S")
                current += 2
            else:
                add("K")
                if string_at(current + 1, 2, " C", " Q", " G"):  # 'mac caffrey'
                    current += 3
                elif string_at(current + 1, 1, "C", "K", "Q") and not string_at(
                    current + 1, 2, "CE", "CI"
                ):
                    current += 2
                else:
                    current += 1
        elif c == "D":
            if string_at(current, 2, "DG"):
                if string_at(current + 2, 1, "I", "E", "Y"):  # 'edge'
                    add("J")
                    current += 3
                else:  # 'edgar'
                    add("TK")
                    current += 2
            elif string_at(current, 2, "DT", "DD"):
                add("T")
                current += 2
            else:
                add("T")
                current += 1
        elif c == "F":
            add("F")
            current += 2 if char_at(current + 1) == "F" else 1
        elif c == "G":
            if char_at(current + 1) == "H":
                if current > 0 and not is_vowel(current - 1):
                    add("K")
                    current += 2
                elif current == 0:
                    if char_at(current + 2) == "I":  # 'ghislane'
                        add("J")
                    else:  # 'ghost'
                        add("K")
                    current += 2
                elif (
                    (current > 1 and string_at(current - 2, 1, "B", "H", "D"))
                    or (current > 2 and string_at(current - 3, 1, "B", "H", "D"))
                    or (current > 3 and string_at(current - 4, 1, "B", "H"))
                ):  # Parker's rule: 'hugh'
                    current += 2
                else:
                    if (
                        current > 2
                        and char_at(current - 1) == "U"
                        and string_at(current - 3, 1, "C", "G", "L", "R", "T")
                    ):  # 'laugh', 'cough', 'rough'
                        add("F")
                    elif current > 0 and char_at(current - 1) != "I":
                        add("K")
                    current += 2
            elif char_at(current + 1) == "N":
                if current == 1 and is_vowel(0) and not slavo:
                    add("KN", "N")
                elif (
                    not string_at(current + 2, 2, "EY")
                    and char_at(current + 1) != "Y"
                    and not slavo
                ):  # not 'cagney'
                    add("N", "KN")
                else:
                    add("KN")
                current += 2
            elif string_at(current + 1, 2, "LI") and not slavo:  # 'tagliaro'
                add("KL", "L")
                current += 2
            elif current == 0 and (
                char_at(current + 1) == "Y"
                or string_at(
                    current + 1, 2,
                    "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER",
                )
            ):  # -ges-, -gep- at beginning
                add("K", "J")
                current += 2
            elif (
                (string_at(current + 1, 2, "ER") or char_at(current + 1) == "Y")
                and not string_at(0, 6, "DANGER", "RANGER", "MANGER")
                and not string_at(current - 1, 1, "E", "I")
                and not string_at(current - 1, 3, "RGY", "OGY")
            ):  # -ger-, -gy-
                add("K", "J")
                current += 2
            elif string_at(current + 1, 1, "E", "I", "Y") or string_at(
                current - 1, 4, "AGGI", "OGGI"
            ):  # italian 'biaggi'
                if (
                    string_at(0, 4, "VAN ", "VON ")
                    or string_at(0, 3, "SCH")
                    or string_at(current + 1, 2, "ET")
                ):  # obvious germanic
                    add("K")
                elif string_at(current + 1, 4, "IER "):  # french ending
                    add("J")
                else:
                    add("J", "K")
                current += 2
            else:
                add("K")
                current += 2 if char_at(current + 1) == "G" else 1
        elif c == "H":
            # keep only if first & before vowel, or between two vowels
            if (current == 0 or is_vowel(current - 1)) and is_vowel(current + 1):
                add("H")
                current += 2
            else:
                current += 1
        elif c == "J":
            if string_at(current, 4, "JOSE") or string_at(0, 4, "SAN "):
                # spanish: 'jose', 'san jacinto'
                if (current == 0 and char_at(current + 4) == " ") or string_at(
                    0, 4, "SAN "
                ):
                    add("H")
                else:
                    add("J", "H")
                current += 1
            else:
                if current == 0:
                    add("J", "A")  # Yankelovich / Jankelowicz
                elif (
                    is_vowel(current - 1)
                    and not slavo
                    and char_at(current + 1) in ("A", "O")
                ):  # spanish 'bajador'
                    add("J", "H")
                elif current == last:
                    add("J", "")
                elif not string_at(
                    current + 1, 1, "L", "T", "K", "S", "N", "M", "B", "Z"
                ) and not string_at(current - 1, 1, "S", "K", "L"):
                    add("J")
                current += 2 if char_at(current + 1) == "J" else 1
        elif c == "K":
            add("K")
            current += 2 if char_at(current + 1) == "K" else 1
        elif c == "L":
            if char_at(current + 1) == "L":
                # spanish 'cabrillo', 'gallegos'
                if (
                    current == length - 3
                    and string_at(current - 1, 4, "ILLO", "ILLA", "ALLE")
                ) or (
                    (string_at(last - 1, 2, "AS", "OS") or string_at(last, 1, "A", "O"))
                    and string_at(current - 1, 4, "ALLE")
                ):
                    add("L", "")
                else:
                    add("L")
                current += 2
            else:
                add("L")
                current += 1
        elif c == "M":
            add("M")
            if (
                string_at(current - 1, 3, "UMB")
                and (current + 1 == last or string_at(current + 2, 2, "ER"))
            ) or char_at(current + 1) == "M":  # 'dumb', 'thumb'
                current += 2
            else:
                current += 1
        elif c == "N":
            add("N")
            current += 2 if char_at(current + 1) == "N" else 1
        elif c == "P":
            if char_at(current + 1) == "H":
                add("F")
                current += 2
            else:
                add("P")
                current += 2 if string_at(current + 1, 1, "P", "B") else 1
        elif c == "Q":
            add("K")
            current += 2 if char_at(current + 1) == "Q" else 1
        elif c == "R":
            if (
                current == last
                and not slavo
                and string_at(current - 2, 2, "IE")
                and not string_at(current - 4, 2, "ME", "MA")
            ):  # french 'rogier', not 'hochmeier'
                add("", "R")
            else:
                add("R")
            current += 2 if char_at(current + 1) == "R" else 1
        elif c == "S":
            if string_at(current - 1, 3, "ISL", "YSL"):  # 'island', 'carlisle'
                current += 1
            elif current == 0 and string_at(current, 5, "SUGAR"):
                add("X", "S")
                current += 1
            elif string_at(current, 2, "SH"):
                if string_at(current + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")  # germanic
                else:
                    add("X")
                current += 2
            elif string_at(current, 3, "SIO", "SIA") or string_at(current, 4, "SIAN"):
                add("S", "S" if slavo else "X")
                current += 3
            elif (current == 0 and string_at(current + 1, 1, "M", "N", "L", "W")) or string_at(
                current + 1, 1, "Z"
            ):  # 'smith' ↔ 'schmidt', 'snider' ↔ 'schneider'; slavic -sz-
                add("S", "X")
                current += 2 if string_at(current + 1, 1, "Z") else 1
            elif string_at(current, 2, "SC"):
                if char_at(current + 2) == "H":  # Schlesinger's rule
                    if string_at(current + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
                        # dutch: 'school', 'schooner'
                        if string_at(current + 3, 2, "ER", "EN"):  # 'schermerhorn'
                            add("X", "SK")
                        else:
                            add("SK")
                        current += 3
                    else:
                        if current == 0 and not is_vowel(3) and char_at(3) != "W":
                            add("X", "S")
                        else:
                            add("X")
                        current += 3
                elif string_at(current + 2, 1, "I", "E", "Y"):
                    add("S")
                    current += 3
                else:
                    add("SK")
                    current += 3
            else:
                if current == last and string_at(current - 2, 2, "AI", "OI"):
                    add("", "S")  # french 'resnais', 'artois'
                else:
                    add("S")
                current += 2 if string_at(current + 1, 1, "S", "Z") else 1
        elif c == "T":
            if string_at(current, 4, "TION"):
                add("X")
                current += 3
            elif string_at(current, 3, "TIA", "TCH"):
                add("X")
                current += 3
            elif string_at(current, 2, "TH") or string_at(current, 3, "TTH"):
                if string_at(current + 2, 2, "OM", "AM") or string_at(
                    0, 4, "VAN ", "VON "
                ) or string_at(0, 3, "SCH"):  # 'thomas', 'thames'
                    add("T")
                else:
                    add("0", "T")
                current += 2
            else:
                add("T")
                current += 2 if string_at(current + 1, 1, "T", "D") else 1
        elif c == "V":
            add("F")
            current += 2 if char_at(current + 1) == "V" else 1
        elif c == "W":
            if string_at(current, 2, "WR"):  # can also be in middle of word
                add("R")
                current += 2
            elif current == 0 and (is_vowel(current + 1) or string_at(current, 2, "WH")):
                if is_vowel(current + 1):  # Wasserman ↔ Vasserman
                    add("A", "F")
                else:  # 'Uomo' ↔ 'Womo'
                    add("A")
                current += 1
            elif (
                (current == last and is_vowel(current - 1))
                or string_at(current - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
                or string_at(0, 3, "SCH")
            ):  # Arnow ↔ Arnoff
                add("", "F")
                current += 1
            elif string_at(current, 4, "WICZ", "WITZ"):  # polish 'filipowicz'
                add("TS", "FX")
                current += 4
            else:
                current += 1
        elif c == "X":
            if not (
                current == last
                and (
                    string_at(current - 3, 3, "IAU", "EAU")
                    or string_at(current - 2, 2, "AU", "OU")
                )
            ):  # french 'breaux'
                add("KS")
            current += 2 if string_at(current + 1, 1, "C", "X") else 1
        elif c == "Z":
            if char_at(current + 1) == "H":  # pinyin 'zhao'
                add("J")
                current += 2
            else:
                if string_at(current + 1, 2, "ZO", "ZI", "ZA") or (
                    slavo and current > 0 and char_at(current - 1) != "T"
                ):
                    add("S", "TS")
                else:
                    add("S")
                current += 2 if char_at(current + 1) == "Z" else 1
        else:
            current += 1

    return "".join(pri), "".join(sec)


def nysiis(word: str) -> str:
    """NYSIIS phonetic code (Taft 1970, the New York State Identification
    and Intelligence System — the vital-records linkage code designed
    for American surnames, with better recall than Soundex on
    spelling variants): original-version rules —

    1. head:  MAC→MCC, KN→NN, K→C, PH/PF→FF, SCH→SSS
    2. tail:  EE/IE→Y, DT/RT/RD/NT/ND→D
    3. scan:  EV→AF else vowels→A, Q→G, Z→S, M→N, KN→N else K→C,
              SCH→SSS, PH→FF, H dropped unless flanked by vowels,
              W→A after a vowel; chars append only when they differ
              from the key's last char
    4. tail cleanup: drop trailing S, AY→Y, drop trailing A

    Completes the phonetic family next to Soundex / Metaphone / Double
    Metaphone (predicates use those; this one is exposed for user
    blocking schemes — it is deliberately NOT in the learner pool, so
    trained settings are untouched). Verified against the widely
    published vectors (Catherine/Katherine/Katerina → CATARAN,
    Jonathan/Johnathan → JANATAN, John → JAN, …)."""
    w = "".join(c for c in word.upper() if c.isalpha())
    if not w:
        return ""
    # 1. head transforms
    if w.startswith("MAC"):
        w = "MCC" + w[3:]
    elif w.startswith("KN"):
        w = "NN" + w[2:]
    elif w.startswith("K"):
        w = "C" + w[1:]
    elif w.startswith(("PH", "PF")):
        w = "FF" + w[2:]
    elif w.startswith("SCH"):
        w = "SSS" + w[3:]
    # 2. tail transforms
    if w.endswith(("EE", "IE")):
        w = w[:-2] + "Y"
    elif w.endswith(("DT", "RT", "RD", "NT", "ND")):
        w = w[:-2] + "D"
    vowels = "AEIOU"
    key = w[0]
    i = 1
    n = len(w)
    while i < n:
        ch = w[i]
        rep = ch
        if w[i : i + 2] == "EV":
            rep = "AF"
            step = 2
        elif ch in vowels:
            rep = "A"
            step = 1
        elif ch == "Q":
            rep = "G"
            step = 1
        elif ch == "Z":
            rep = "S"
            step = 1
        elif ch == "M":
            rep = "N"
            step = 1
        elif w[i : i + 2] == "KN":
            rep = "N"
            step = 2
        elif ch == "K":
            rep = "C"
            step = 1
        elif w[i : i + 3] == "SCH":
            rep = "SSS"
            step = 3
        elif w[i : i + 2] == "PH":
            rep = "FF"
            step = 2
        elif ch == "H" and (
            w[i - 1] not in vowels or (i + 1 < n and w[i + 1] not in vowels)
        ):
            rep = "A" if w[i - 1] in vowels else w[i - 1]
            step = 1
        elif ch == "W" and w[i - 1] in vowels:
            rep = "A"
            step = 1
        else:
            step = 1
        for c in rep:
            if c != key[-1]:
                key += c
        i += step
    # 4. tail cleanup
    if key.endswith("S") and len(key) > 1:
        key = key[:-1]
    if key.endswith("AY") and len(key) > 2:
        key = key[:-2] + "Y"
    if key.endswith("A") and len(key) > 1:
        key = key[:-1]
    return key
