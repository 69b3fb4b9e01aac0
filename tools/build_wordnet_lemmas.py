#!/usr/bin/env python
"""Build the vendored WordNet lemma table for METEOR's synonym stage.

Run ONCE on a machine with network access (or with the nltk WordNet corpus
already downloaded):

    python tools/build_wordnet_lemmas.py

It downloads the nltk WordNet corpus if missing, extracts every word's
synset lemma names, and writes them to
``icek_tpu/metrics/data/wordnet_lemmas.json.gz`` — from then on METEOR's
synonym stage works on machines without nltk corpus data (the table is
checked by ``icek_tpu.metrics.meteor.resolve_synonyms`` first).

WordNet license: Princeton WordNet is redistributable with notice
(https://wordnet.princeton.edu/license-and-commercial-use); the generated
file embeds the required notice in its metadata entry.
"""

import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icek_tpu.metrics.meteor import VENDORED_LEMMAS  # noqa: E402

NOTICE = (
    "WordNet 3.0 Copyright 2006 by Princeton University. All rights "
    "reserved. THIS SOFTWARE AND DATABASE IS PROVIDED 'AS IS' AND PRINCETON "
    "UNIVERSITY MAKES NO REPRESENTATIONS OR WARRANTIES, EXPRESS OR IMPLIED."
)


def main() -> int:
    try:
        import nltk
        from nltk.corpus import wordnet

        try:
            wordnet.synsets("test")
        except LookupError:
            print("Downloading the nltk WordNet corpus ...")
            if not nltk.download("wordnet"):
                raise RuntimeError("nltk.download('wordnet') failed")
            wordnet.synsets("test")
    except Exception as exc:  # loud failure, never a silent no-op
        print(
            f"ERROR: cannot obtain WordNet data ({type(exc).__name__}: {exc}).\n"
            "This tool needs network access (or a pre-downloaded nltk "
            "WordNet corpus). METEOR will run with the synonym stage "
            "disabled until the table is built.",
            file=sys.stderr,
        )
        return 1

    table = {}
    for word in wordnet.all_lemma_names():
        lemmas = sorted(
            {
                lemma.name().lower()
                for synset in wordnet.synsets(word)
                for lemma in synset.lemmas()
            }
            - {word}
        )
        if lemmas:
            table[word] = lemmas
    table["__license__"] = [NOTICE]
    os.makedirs(os.path.dirname(VENDORED_LEMMAS), exist_ok=True)
    with gzip.open(VENDORED_LEMMAS, "wt") as f:
        json.dump(table, f)
    print(f"Wrote {len(table) - 1} entries to {VENDORED_LEMMAS}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
