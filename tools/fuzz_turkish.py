#!/usr/bin/env python3
"""Dev-time fuzz generator for the Turkish stemmer fixture.

Builds a word list that exercises every branch of the Turkish Snowball
state machine — roots of each harmony class (incl. d/g endings and vowel
endings that trigger the y/s/n buffer consonants) crossed with 1–3-deep
suffix chains from the recovered among tables, `-ki` chains, reserved-word
inflections, and random alphabet strings — then stems each with the
PostgreSQL dict_snowball oracle and appends novel `word<TAB>stem` pairs to
src/test/resources/stem/turkish.tsv.
"""
import random
import subprocess
import sys
import os

random.seed(20260817)

ROOTS = [
    # plain roots across harmony classes
    "kitap", "ev", "göz", "okul", "gül", "kız", "deniz", "yol", "gün",
    "araba", "kedi", "kapı", "köprü", "kutu", "ütü", "baba", "anne",
    "şehir", "ağaç", "çocuk", "defter", "kalem", "bilgisayar", "üniversite",
    # d/g endings (append_U) and b/c/d/ğ endings (devoicing)
    "kanad", "senedi", "kitab", "ağac", "çeliğ", "dolab", "yurd", "ilaç",
    "renk", "uçurtma", "öd", "ad", "soyad", "adalar", "adam", "yad",
    # vowel endings (buffer consonants y/s/n)
    "kapı", "su", "köy", "sıra", "pencere", "gemi", "koru", "ordu",
    # disharmonic / loanword-ish
    "saat", "kalp", "rol", "halüsinasyon", "otomobil", "televizyon",
    # short / degenerate
    "o", "at", "el", "iki", "aa", "ıı", "ee",
]

SUF1 = ["lar", "ler", "ları", "leri", "ı", "i", "u", "ü", "yı", "yi", "yu",
        "yü", "sı", "si", "su", "sü", "m", "n", "ım", "im", "um", "üm",
        "mız", "miz", "muz", "müz", "nız", "niz", "nuz", "nüz",
        "da", "de", "ta", "te", "nda", "nde", "dan", "den", "tan", "ten",
        "ndan", "nden", "na", "ne", "ya", "ye", "nı", "ni", "nu", "nü",
        "ın", "in", "un", "ün", "nın", "nin", "nun", "nün", "la", "le",
        "yla", "yle", "ca", "ce", "nca", "nce", "ki"]
SUF2 = ["dı", "di", "du", "dü", "tı", "ti", "dık", "dik", "dım", "dim",
        "dın", "din", "mış", "miş", "muş", "müş", "ymış", "ymiş", "ydı",
        "ydi", "sa", "se", "ysa", "yse", "sak", "sek", "sam", "sem", "san",
        "sen", "ken", "yken", "dır", "dir", "dur", "dür", "tır", "tir",
        "sın", "sin", "sun", "sün", "ız", "iz", "uz", "üz", "yız", "yiz",
        "sınız", "siniz", "sunuz", "sünüz", "casına", "cesine",
        "dur", "lardı", "lerdi", "larmış", "lermiş", "larsa", "lerse"]
KI = ["ki", "deki", "teki", "daki", "takı", "ndeki", "ndaki", "nınki",
      "ninki", "nunki", "nünki", "dekiler", "dekilerin", "ndekilerden",
      "dekinin", "dekini", "kiler", "kilerin", "kinin", "kini", "kiye",
      "dekiki", "dekideki", "lerdekilerinki", "larındaki", "lerindeki",
      "sındaki", "sindeki", "larınınki", "ındaki", "indeki", "undaki"]

words = set()
for r in ROOTS:
    words.add(r)
    for s in SUF1:
        words.add(r + s)
        for s2 in SUF2:
            words.add(r + s + s2)
    for k in KI:
        words.add(r + k)
        for s in ("ler", "in", "nden", "yle", "ydi", "siniz"):
            words.add(r + k + s)
# bare and stacked suffixes (empty-stem edge) + reserved-word shapes
for s in SUF1 + SUF2 + KI:
    words.add(s)
    words.add("ad" + s)
    words.add("soyad" + s)
# random strings over the alphabet, biased toward vowels
AL = "abcçdefgğhıijklmnoöprsştuüvyz"
V = "aeıioöuü"
for _ in range(12000):
    n = random.randint(2, 14)
    w = "".join((random.choice(V) if random.random() < 0.45 else random.choice(AL))
                for _ in range(n))
    words.add(w)
# random root + random suffix pile
ALLSUF = SUF1 + SUF2 + KI
for _ in range(12000):
    w = random.choice(ROOTS) + "".join(random.choice(ALLSUF)
                                       for _ in range(random.randint(1, 4)))
    words.add(w)

words = sorted(w for w in words if w and "'" not in w)
print(f"{len(words)} fuzz words", file=sys.stderr)

sql = ["CREATE TEXT SEARCH DICTIONARY IF NOT EXISTS g_turkish (TEMPLATE = snowball, Language = 'turkish');"]
for w in words:
    sql.append(f"SELECT '{w}' || E'\\t' || COALESCE((ts_lexize('g_turkish', '{w}'))[1], '<stop>');")
proc = subprocess.run(
    ["su", "postgres", "-c",
     "cd /tmp && psql -h /tmp/pgstem -p 54329 -d postgres -qAtX"],
    input="\n".join(sql), capture_output=True, text=True)
pairs = []
for line in proc.stdout.splitlines():
    if "\t" in line:
        w, stem = line.split("\t", 1)
        if stem != "<stop>":
            pairs.append((w, stem))
print(f"{len(pairs)} oracle pairs", file=sys.stderr)

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/turkish_fuzz.tsv"
with open(out, "w") as f:
    for w, stem in pairs:
        f.write(f"{w}\t{stem}\n")
print(f"wrote {out}", file=sys.stderr)
