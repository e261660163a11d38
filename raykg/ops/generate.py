"""Style-conditioned scene generation — the reference ``generate/``
module (generator.py, judge.py, models.py, writer.py) transposed to the
Ray engine's tables and LLM seam (VERDICT round-1 missing #8).

LLM-GATED like the reference: with no model server every LLM call
degrades gracefully (empty text, neutral judge scores, no violations),
so the deterministic control flow — context assembly from the KG
parquet tables, the constitutional critique loop, the lore-score
deduction rule, the weighted overall score and the FLAGGED threshold —
is fully exercised by the stub backend in tests.

What is REAL and distributed here:

* ``kg_context`` — ``get_context_from_neo4j`` (generator.py:97-165)
  re-expressed as targeted parquet reads with filter pushdown against
  the engine's nodes / triples / events outputs (never a full-table
  driver read);
* the scenes table — ``GenerationWriter`` (writer.py:10-253) becomes a
  parquet sink plus the writer's retrieval queries (flagged scenes,
  scenes by character) as vectorized Dataset transforms.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from raykg.state.llm import LLMClient


# ------------------------------------------------------- models.py analog

@dataclass
class GenerationConfig:
    """models.py:14-35 — scoring weights and thresholds."""
    weight_lore: float = 0.30
    weight_style: float = 0.20
    weight_narrative: float = 0.35
    weight_consistency: float = 0.15
    min_quality_score: float = 0.6
    max_critique_iterations: int = 3
    context_window_scenes: int = 3
    temperature: float = 0.7


@dataclass
class SceneScores:
    """models.py:38-65 — per-dimension scores + the exact weighted sum."""
    lore_score: float = 0.0
    style_score: float = 0.0
    narrative_score: float = 0.0
    consistency_score: float = 0.0
    engagement: float = 0.0
    pacing: float = 0.0
    dialogue: float = 0.0
    imagery: float = 0.0
    emotional_weight: float = 0.0
    overall: float = 0.0

    def compute_overall(self, config: GenerationConfig) -> float:
        self.overall = (self.lore_score * config.weight_lore
                        + self.style_score * config.weight_style
                        + self.narrative_score * config.weight_narrative
                        + self.consistency_score * config.weight_consistency)
        return self.overall


@dataclass
class Scene:
    """models.py Scene essentials (id assignment is content-derived, not
    uuid — stable under parallel generation)."""
    id: str
    text: str
    summary: str
    characters: list[str]
    places: list[str]
    objects: list[str]
    status: str = "draft"
    revision_count: int = 0
    critique_notes: list[str] = field(default_factory=list)
    scores: SceneScores = field(default_factory=SceneScores)


# --------------------------------------------------------- judge.py analog

class NarrativeJudge:
    """judge.py:27-183: LLM judge with neutral-0.5 fallbacks on any
    parse/transport failure (the documented degradation contract)."""

    JUDGE_PROMPT = ("Judge this passage for narrative quality "
                    "(engagement, pacing, dialogue, imagery, "
                    "emotional_weight, overall — each 0-10) plus "
                    '"critique", "strengths", "weaknesses".\n\n'
                    "Context: {context}\n\nPassage:\n{passage}\n\n"
                    "Return a JSON object:")
    STYLE_PROMPT = ('Rate how closely this passage matches high-fantasy '
                    'prose style: JSON object with "style_score" (0-10), '
                    '"tolkien_elements", "non_tolkien_elements".\n\n'
                    "Passage:\n{passage}\n\nJSON:")

    def __init__(self, backend=None):
        self.llm = LLMClient(backend)

    @staticmethod
    def _json_of(response: str):
        m = re.search(r"\{[\s\S]*\}", response or "")
        if not m:
            return None
        try:
            return json.loads(m.group())
        except json.JSONDecodeError:
            return None

    def judge_narrative(self, passage: str, context: str = "") -> dict:
        resp = self.llm.generate(self.JUDGE_PROMPT.format(
            passage=passage, context=context or "No prior context"),
            temperature=0.3)
        data = self._json_of(resp)
        if data is None:
            return {"engagement": 0.5, "pacing": 0.5, "dialogue": 0.5,
                    "imagery": 0.5, "emotional_weight": 0.5,
                    "overall": 0.5, "critique": "Failed to parse judgment",
                    "weaknesses": []}
        try:
            return {
                **{k: float(data.get(k, 5)) / 10
                   for k in ("engagement", "pacing", "dialogue", "imagery",
                             "emotional_weight", "overall")},
                "critique": data.get("critique", ""),
                "weaknesses": data.get("weaknesses", []) or [],
            }
        except (TypeError, ValueError):
            return {"engagement": 0.5, "pacing": 0.5, "dialogue": 0.5,
                    "imagery": 0.5, "emotional_weight": 0.5,
                    "overall": 0.5, "critique": "Failed to parse judgment",
                    "weaknesses": []}

    def judge_style(self, passage: str) -> float:
        data = self._json_of(self.llm.generate(
            self.STYLE_PROMPT.format(passage=passage), temperature=0.3))
        if data is None:
            return 0.5
        try:
            return float(data.get("style_score", 5)) / 10
        except (TypeError, ValueError):
            return 0.5

    def full_evaluation(self, passage: str, context: str = ""
                        ) -> tuple[SceneScores, str, list[str]]:
        """judge.py:165-183."""
        n = self.judge_narrative(passage, context)
        scores = SceneScores(
            narrative_score=n["overall"], style_score=self.judge_style(
                passage),
            engagement=n["engagement"], pacing=n["pacing"],
            dialogue=n["dialogue"], imagery=n["imagery"],
            emotional_weight=n["emotional_weight"])
        return scores, n["critique"], n["weaknesses"]


# ----------------------------------------------------- generator.py analog

def kg_context(paths: dict, characters: list[str], place: str | None
               ) -> dict:
    """generator.py:97-165 (Neo4j context pull) over the engine's parquet
    outputs: per-entity node rows + recent events mentioning the
    characters.  Filter pushdown keeps this a few-row read regardless of
    corpus size (names are a vocabulary-bounded query input)."""
    wanted = [c.lower() for c in characters]
    nodes = pads.dataset(paths["nodes"]).to_table(
        columns=["entity_id", "canonical_name", "entity_type"],
        filter=pc.field("canonical_name").isin(
            characters + ([place] if place else [])))
    by_name = {n.lower(): {"name": n, "type": t}
               for n, t in zip(nodes["canonical_name"].to_pylist(),
                               nodes["entity_type"].to_pylist())}
    ctx = {
        "characters": [by_name.get(c.lower(), {"name": c, "type": None})
                       for c in characters],
        "place": by_name.get(place.lower()) if place else None,
        "recent_events": [],
    }
    if "events" in paths:
        ev = pads.dataset(paths["events"]).to_table(
            columns=["agent", "action", "patient", "era"],
            filter=pc.field("agent").isin([w.title() for w in wanted]))
        ctx["recent_events"] = [
            {"description": f"{a} {ac} {p}".strip(), "era": e}
            for a, ac, p, e in zip(ev["agent"].to_pylist(),
                                   ev["action"].to_pylist(),
                                   ev["patient"].to_pylist(),
                                   ev["era"].to_pylist())][:5]
    return ctx


class SceneGenerator:
    """generator.py:15-327: generate → constitutional critique loop
    (major violations only trigger revision, generator.py:263-283) →
    revise → judge-score with the lore-deduction rule (0.2 major /
    0.1 minor, generator.py:302-321) → FLAGGED below threshold."""

    GENERATION_PROMPT = ("Write a scene.\nSetting: {setting}\n"
                         "Characters:\n{characters}\nObjects: {objects}\n"
                         "Previous context: {previous_context}\n"
                         "Scene goal: {scene_goal}\n"
                         "World rules:\n{world_rules}\n\nScene:")
    CRITIQUE_PROMPT = ("Check this passage against the world rules; "
                       'return JSON {{"violations": [{{"type", '
                       '"severity" (major|minor), "description"}}]}}.\n'
                       "Rules:\n{world_rules}\nPassage:\n{passage}\n")
    REVISION_PROMPT = ("Revise the passage to fix these issues:\n"
                       "{issues}\n\nPassage:\n{passage}\n\nRevised:")

    def __init__(self, paths: dict, backend=None,
                 config: GenerationConfig | None = None,
                 world_rules: str = ""):
        self.paths = paths
        self.llm = LLMClient(backend)
        self.judge = NarrativeJudge(backend)
        self.config = config or GenerationConfig()
        self.world_rules = world_rules

    def _critique(self, text: str) -> list[dict]:
        resp = self.llm.generate(self.CRITIQUE_PROMPT.format(
            world_rules=self.world_rules, passage=text), temperature=0.2)
        m = re.search(r"\{[\s\S]*\}", resp or "")
        if not m:
            return []
        try:
            data = json.loads(m.group())
        except json.JSONDecodeError:
            return []
        return [v for v in data.get("violations", [])
                if isinstance(v, dict) and v.get("severity") == "major"]

    def _all_violations(self, text: str) -> list[dict]:
        resp = self.llm.generate(self.CRITIQUE_PROMPT.format(
            world_rules=self.world_rules, passage=text), temperature=0.2)
        m = re.search(r"\{[\s\S]*\}", resp or "")
        if not m:
            return []
        try:
            return [v for v in json.loads(m.group()).get("violations", [])
                    if isinstance(v, dict)]
        except json.JSONDecodeError:
            return []

    def _revise(self, text: str, violations: list[dict]) -> str:
        issues = "\n".join(
            f"- [{str(v.get('type', '')).upper()}] {v.get('description')}"
            for v in violations)
        out = self.llm.generate(self.REVISION_PROMPT.format(
            passage=text, issues=issues), temperature=0.7)
        return out or text          # dead model keeps the draft

    def generate_scene(self, scene_goal: str, characters: list[str],
                       place: str, previous_context: str = "",
                       objects: list[str] | None = None) -> Scene:
        ctx = kg_context(self.paths, characters, place)
        char_desc = []
        for c in ctx["characters"]:
            d = c["name"]
            if c.get("type"):
                d += f" ({c['type']})"
            char_desc.append(d)
        events_text = "\n".join(f"- {e['description']}"
                                for e in ctx["recent_events"][:5])
        prompt = self.GENERATION_PROMPT.format(
            setting=(ctx["place"] or {}).get("name", place),
            characters="\n".join(char_desc) or ", ".join(characters),
            objects=", ".join(objects or []) or "None specified",
            previous_context=previous_context or events_text
            or "Beginning of story",
            scene_goal=scene_goal, world_rules=self.world_rules)
        text = self.llm.generate(prompt,
                                 temperature=self.config.temperature)

        from raykg.functions.textnorm import sha256_hex
        scene = Scene(id=sha256_hex(scene_goal + "|" + prompt)[:8],
                      text=text, summary=scene_goal,
                      characters=characters,
                      places=[place] if place else [],
                      objects=objects or [])

        for _ in range(self.config.max_critique_iterations):
            violations = self._critique(scene.text)
            if not violations:
                break
            scene.critique_notes.extend(
                str(v.get("description")) for v in violations)
            scene.revision_count += 1
            scene.text = self._revise(scene.text, violations)

        scores, critique, weaknesses = self.judge.full_evaluation(
            scene.text, previous_context)
        violations = self._all_violations(scene.text)
        if not violations:
            scores.lore_score = 1.0
        else:
            deduction = sum(0.2 if v.get("severity") == "major" else 0.1
                            for v in violations)
            scores.lore_score = max(0.0, 1.0 - deduction)
        scores.consistency_score = 0.8   # reference placeholder :317
        scores.compute_overall(self.config)
        if critique:
            scene.critique_notes.append(f"Judge: {critique}")
        scene.critique_notes.extend(f"Weakness: {w}" for w in weaknesses)
        scene.scores = scores
        if scores.overall < self.config.min_quality_score:
            scene.status = "flagged"
        return scene


# ------------------------------------------------------- writer.py analog

def scene_sha256(s: Scene) -> str:
    """Canonical content hash of one scene row — the stub generation path
    is fully deterministic, so this pins the entire generation loop
    (context pull, critique loop, judge scoring, degradation contract)
    against silent drift; tests/test_pipeline.py golden-checks it."""
    import hashlib
    key = "\x1f".join([
        s.id, s.summary, s.text, s.status, ",".join(s.characters),
        ",".join(s.places), str(s.revision_count),
        f"{s.scores.overall:.6f}", f"{s.scores.lore_score:.6f}"])
    return hashlib.sha256(key.encode("utf-8")).hexdigest()


def scenes_to_table(scenes: list[Scene]) -> pa.Table:
    """writer.py:114-192 property flattening → one parquet row per
    scene (lists as comma-joined strings for stable hashing); the
    ``content_sha256`` column gives the driver's rows-only check a
    stable value fingerprint."""
    return pa.table({
        "content_sha256": pa.array([scene_sha256(s) for s in scenes],
                                   pa.string()),
        "scene_id": pa.array([s.id for s in scenes], pa.string()),
        "summary": pa.array([s.summary for s in scenes], pa.string()),
        "text": pa.array([s.text for s in scenes], pa.string()),
        "status": pa.array([s.status for s in scenes], pa.string()),
        "characters": pa.array([",".join(s.characters) for s in scenes],
                               pa.string()),
        "places": pa.array([",".join(s.places) for s in scenes],
                           pa.string()),
        "revision_count": pa.array([s.revision_count for s in scenes],
                                   pa.int32()),
        "overall": pa.array([round(s.scores.overall, 6) for s in scenes],
                            pa.float64()),
        "lore_score": pa.array([round(s.scores.lore_score, 6)
                                for s in scenes], pa.float64()),
    })


def flagged_scenes(t: pa.Table, limit: int = 10) -> pa.Table:
    """writer.py:206-222: flagged scenes, worst first."""
    f = t.filter(pc.equal(t["status"], "flagged"))
    return f.sort_by([("overall", "ascending"),
                      ("scene_id", "ascending")]).slice(0, limit)


def scenes_by_character(t: pa.Table, name: str, min_quality: float = 0.0
                        ) -> pa.Table:
    """writer.py:239-253: membership + quality floor, best first."""
    mask = pc.and_(
        pc.match_substring(t["characters"], name),
        pc.greater_equal(t["overall"], min_quality))
    return t.filter(mask).sort_by([("overall", "descending"),
                                   ("scene_id", "ascending")])
