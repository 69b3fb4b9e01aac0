"""Fact-accuracy metric (knowledge preset) — string-level verification of
generated facts against the per-image knowledge context.

Re-implements knowledge-aware/fact_accuracy_metric.py:8-411: temporal facts
(years 1000-1999 with lookbehind blocklists) are checked for a relevant
generated subject entity and a realized predicate phrase; non-temporal facts
via per-predicate phrase patterns (incl. tuple phrases with distance
constraints).  Consumes the same ``data/*.pkl`` predicate tables and raw
``captions_split.json`` + context pickles.
"""

from __future__ import annotations

import json
import pickle
import re
from typing import Dict, List, Sequence, Tuple

from icek_tpu.data.codec import normalize_name_geo

YEAR_CORE = r"\b(1\d{3})\b"
_YEAR_RE = re.compile(
    r"(?i)"
    r"(?<!no\..{4}\s)(?<!no\s.{4}\s)(?<!no\.\s.{4}\s)"
    r"(?<!no.)(?<!no.\s)(?<!no\s)"
    r"(?<!footpath\s)(?<!postbox )" + YEAR_CORE
)
_YEAR_ONLY_RE = re.compile(YEAR_CORE)


def extract_years(text: str) -> List[str]:
    return _YEAR_RE.findall(text) + re.findall("<unk_fact>", text)


def is_year(text: str) -> bool:
    try:
        int(text)
    except (TypeError, ValueError):
        return False
    return bool(_YEAR_ONLY_RE.findall(text))


def _substring_related(a: str, b: str) -> bool:
    return a in b or b in a


class FactAccuracyMetric:
    def __init__(
        self,
        splits_captions_json_path: str,
        entity_context_path: str,
        knowledge_path: str,
        predicates_merged_synonyms: Dict[str, str],
        predicates_merged_for_entity_type: Dict[str, List[str]],
        predicate_to_phrases: Dict[str, Dict],
    ):
        with open(splits_captions_json_path) as f:
            self.data = json.load(f)
        with open(entity_context_path, "rb") as f:
            entity_contexts = pickle.load(f)
        with open(knowledge_path, "rb") as f:
            knowledge_contexts = pickle.load(f)
        for url in entity_contexts:
            entity_contexts[url]["name"] = entity_contexts[url]["name"].apply(
                normalize_name_geo
            )
            knowledge_contexts[url]["subject"] = knowledge_contexts[url][
                "subject"
            ].apply(normalize_name_geo)
        self.entity_contexts = entity_contexts
        self.knowledge_contexts = knowledge_contexts
        self.merged_synonyms = predicates_merged_synonyms
        self.merged_for_type = predicates_merged_for_entity_type
        self.predicate_phrases = predicate_to_phrases

    @classmethod
    def from_data_dir(
        cls, splits, entities, knowledge, data_dir: str
    ) -> "FactAccuracyMetric":
        import os

        def load(name):
            with open(os.path.join(data_dir, name), "rb") as f:
                return pickle.load(f)

        return cls(
            splits, entities, knowledge,
            load("predicates_merged_synonyms.pkl"),
            load("predicates_merged_for_entity_type.pkl"),
            load("predicate_to_phrases.pkl"),
        )

    # -- ground truth ---------------------------------------------------

    def ground_truth(self, n_generated: int):
        captions, urls, entity_names = [], [], []
        for img in self.data["images"]:
            if img["split"] != "test":
                continue
            captions.append(" ".join(img["tokens"]))
            entity_names.append(
                [t for i, t in enumerate(img["tokens"]) if img["mask"][i] == 1]
            )
            urls.append(img["url"])
        assert len(captions) == n_generated
        return captions, urls, entity_names

    # -- temporal facts -------------------------------------------------

    def _relevant_year_entity(
        self, caption, years, gt_entities, knowledge, entities
    ) -> bool:
        subjects = list(
            knowledge[knowledge["object"].isin(years)]["subject"].unique()
        )
        in_context = entities[entities["name"].isin(subjects)]
        if not in_context.empty:
            candidates = list(in_context["name"].values)
        else:
            candidates = []
            for subj in subjects:
                best, best_len = None, 0
                for name in entities["name"].values:
                    if (
                        ((subj in name and "_" in subj)
                         or (name in subj and "_" in name))
                        and len(name) > best_len
                    ):
                        best, best_len = name, len(name)
                if best is not None:
                    candidates.append(best)
        for name in candidates:
            underscored = name.replace(" ", "_")
            if (name in caption or underscored in caption) and (
                underscored in gt_entities
                or any(underscored in g for g in gt_entities)
                or any(g in underscored for g in gt_entities)
            ):
                return True
        return False

    def _realized_year_predicate(self, caption, years, gt_caption, knowledge) -> bool:
        facts = knowledge[knowledge["object"].isin(years)].copy()
        # disambiguate repeated 'years' predicates per (subject, predicate)
        counters: Dict[tuple, int] = {}
        predicates = []
        for _, row in facts.iterrows():
            key = (row["subject"], row["predicate"])
            n = counters.get(key, 0)
            counters[key] = n + 1
            pred = row["predicate"]
            predicates.append(f"{pred}_{n}" if pred == "years" else pred)
        for pred in dict.fromkeys(predicates):
            label = self.merged_synonyms.get(pred, pred)
            # DELIBERATE divergence from the reference: its
            # check_predicate_for_year extends the SHARED
            # predicate_to_phrases table in place
            # (knowledge-aware/fact_accuracy_metric.py:219,230), so after
            # the first caption that hits the entity-type merge branch,
            # every later caption matches against the polluted phrase set
            # and the metric depends on caption processing ORDER.  The
            # copy here keeps the table immutable; corpora that trigger
            # that branch can score slightly lower (stricter) than the
            # reference's order-dependent number.
            phrases = list(
                self.predicate_phrases.get(label, {}).get(
                    "phrases", [label.replace("_", " ")]
                )
            )
            if any(p in caption for p in phrases):
                return True
            for ent_type, merged in self.merged_for_type.items():
                if ent_type in caption and label in merged:
                    for other in merged:
                        phrases.extend(self.predicate_phrases[other]["phrases"])
                    if any(p in caption for p in phrases):
                        return True
        # same year + same temporal phrase category on both sides
        shared = set(extract_years(gt_caption)) & set(years)
        for year in shared:
            left_gt = gt_caption[: gt_caption.find(year)]
            left_gen = caption[: caption.find(year)]
            for pred, data in self.predicate_phrases.items():
                if data["type"] != "temporal":
                    continue
                if any(p in left_gen for p in data["phrases"]) and any(
                    p in left_gt for p in data["phrases"]
                ):
                    return True
        return False

    def check_temporal(self, caption, gt_caption, gt_entities, url):
        years = extract_years(caption)
        if not years:
            return False, False
        entities = self.entity_contexts[url]
        knowledge = self.knowledge_contexts[url]
        ok = self._relevant_year_entity(
            caption, years, gt_entities, knowledge, entities
        ) and self._realized_year_predicate(caption, years, gt_caption, knowledge)
        return True, ok

    # -- other facts ----------------------------------------------------

    def check_other(self, caption, gt_entities, url) -> Tuple[int, int]:
        entities = self.entity_contexts[url]
        knowledge = self.knowledge_contexts[url]
        generated_names = []
        for name in entities["name"].values:
            if name in caption or name.replace("_", " ") in caption:
                underscored = name.replace(" ", "_")
                if (
                    underscored in gt_entities
                    or any(g in underscored for g in gt_entities)
                    or any(underscored in g for g in gt_entities)
                ):
                    generated_names.append(name)
        subjects = [
            subj
            for name in generated_names
            for subj in knowledge["subject"].unique()
            if _substring_related(subj, name)
        ]
        has_fact = correct = 0
        all_objects = knowledge["object"].unique()
        if not any(obj in caption for obj in all_objects):
            return 0, 0
        for pred, data in self.predicate_phrases.items():
            if data["type"] == "temporal":
                continue
            group = [pred] + data["synonymous_predicates"]
            facts = knowledge[knowledge["predicate"].isin(group)]
            expected = facts[facts["subject"].isin(subjects)]["object"].unique()
            for phrase in data["phrases"]:
                if isinstance(phrase, str):
                    matched = (
                        phrase in caption
                        and (
                            not data["entity_types"]
                            or any(t in caption for t in data["entity_types"])
                        )
                        and not any(b in caption for b in data["blocklist"])
                    )
                    anchor = phrase
                else:
                    first, second = phrase[0], phrase[1]
                    matched = (
                        first in caption
                        and second in caption
                        and caption.find(first) < caption.find(second)
                        and caption.find(second) - caption.find(first) < 20
                        and (
                            not data["entity_types"]
                            or (
                                any(t in caption for t in data["entity_types"])
                                and caption.find(first)
                                > max(caption.find(t) for t in data["entity_types"])
                            )
                        )
                        and not any(b in caption for b in data["blocklist"])
                    )
                    anchor = second if matched else None
                if not matched:
                    continue
                if data["object_position"] == "right" and anchor is not None:
                    window = anchor.join(caption.split(anchor)[1:])
                else:
                    window = caption
                if any(obj in window for obj in all_objects):
                    has_fact += 1
                    if any(obj in window for obj in expected):
                        correct += 1
        return has_fact, correct

    # -- driver ---------------------------------------------------------

    def run(self, generated_captions: Sequence[str], log=print) -> Dict[str, float]:
        gt_captions, urls, gt_entities = self.ground_truth(len(generated_captions))
        temporal = correct_temporal = other = correct_other = 0
        for cap, gt, ents, url in zip(
            generated_captions, gt_captions, gt_entities, urls
        ):
            has_t, ok_t = self.check_temporal(cap, gt, ents, url)
            temporal += has_t
            correct_temporal += ok_t
            has_o, ok_o = self.check_other(cap, ents, url)
            other += has_o
            correct_other += ok_o
        acc_temporal = correct_temporal / temporal if temporal else 0.0
        acc_other = correct_other / other if other else 0.0
        total = temporal + other
        acc_all = (correct_temporal + correct_other) / total if total else 0.0
        log(f"Accuracy (temporal): {acc_temporal}")
        log(f"Accuracy (other): {acc_other}")
        log(f"ACCURACY (all): {acc_all}")
        return {
            "temporal": acc_temporal,
            "other": acc_other,
            "all": acc_all,
            "n_temporal": temporal,
            "n_other": other,
        }
