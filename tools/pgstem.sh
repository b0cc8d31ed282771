#!/bin/bash
# Probe PostgreSQL 15's dict_snowball for a language: pgstem.sh <lang> <word>...
# Dev-time oracle only (same cluster gen_stem_fixtures.py uses).
lang="$1"; shift
sql="CREATE TEXT SEARCH DICTIONARY IF NOT EXISTS g_$lang (TEMPLATE = snowball, Language = '$lang');"
for w in "$@"; do
  sql="$sql SELECT '$w' || ' -> ' || COALESCE((ts_lexize('g_$lang', '$w'))[1], '<stop>');"
done
echo "$sql" | su postgres -c "cd /tmp && psql -h /tmp/pgstem -p 54329 -d postgres -qAtX" 2>/dev/null
