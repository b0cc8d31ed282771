#!/usr/bin/env python3
"""Regenerate src/main/resources/graft/stopwords.txt from the reference's
vendored Snowball-project stop word data (public, BSD-3 licensed by the
Snowball project — see the license header in
/root/reference/src/tokenizer/stop_word_filter/stopwords.rs) plus the
Lucene-derived English list documented at stop_word_filter/mod.rs:41-48.

Output format: one line per language, `<lang>:<space-separated words>`.
"""
import re

REF = "/root/reference/src/tokenizer/stop_word_filter"
OUT = "src/main/resources/graft/stopwords.txt"

src = open(f"{REF}/stopwords.rs", encoding="utf-8").read()
langs = {}
for m in re.finditer(r"pub const (\w+): &\[&str\] = &\[(.*?)\];", src, re.S):
    words = re.findall(r'"((?:[^"\\]|\\.)*)"', m.group(2))
    langs[m.group(1).lower()] = words

mod = open(f"{REF}/mod.rs", encoding="utf-8").read()
em = re.search(r"Language::English => \{.*?&\[(.*?)\]\s*\}", mod, re.S)
langs["english"] = re.findall(r'"((?:[^"\\]|\\.)*)"', em.group(1))

with open(OUT, "w", encoding="utf-8") as f:
    f.write(
        "# Stop word lists, one `lang:words...` line each. Data from the\n"
        "# Snowball project (https://snowballstem.org/, BSD-3) as vendored\n"
        "# by the reference (stop_word_filter/stopwords.rs); English is the\n"
        "# Lucene list the reference uses (stop_word_filter/mod.rs:41-48).\n"
        "# Regenerate with tools/gen_stopwords.py.\n")
    for lang in sorted(langs):
        f.write(f"{lang}:{' '.join(langs[lang])}\n")
print({k: len(v) for k, v in sorted(langs.items())})
