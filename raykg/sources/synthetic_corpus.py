"""Deterministic synthetic source corpus in the ``input_hint`` shape.

Produces the primary input table ``(repo, path, commit, lang, content)``
(`BASELINE.json.input_hint`) at a scale derived from the sf directory name,
plus the broadcast ``alias_table`` (seed-entity analog of the reference's
``data/seeds/*.json``, ``models/entities.py:6-62``) and a ``truth_triples``
ground-truth table so exact P/R is computable (FIXTURES.md §1).

Content embeds known ground truth per FIXTURES.md: exact names, aliases,
article-prefixed place forms, unknown entities, alias statements, chapter
markers, abbreviations and dialogue quotes. ~70% of files are prose
(``lang='txt'``, exercising the book-side operators) and ~30% are code
(``lang='py'``, exercising the import/def/call extractors the north star
requires).

Everything is a pure function of (GEN_VERSION, sf tag, file index) — no wall
clock, no global RNG — so the Ray engine and the DuckDB oracle always read
identical bytes. Generated files are cached under ``/tmp/raykg_data``.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raykg import vocab
from raykg.functions.textnorm import sha256_hex, slugify

GEN_VERSION = 17
CACHE_ROOT = "/tmp/raykg_data"

# ---------------------------------------------------------------- name pools

_CHAR_PRE = ["Al", "Bel", "Cor", "Dur", "El", "Fen", "Gal", "Hal", "Ith",
             "Jor", "Kel", "Lor", "Mor", "Nar", "Or", "Pel", "Quil", "Rod",
             "Ser", "Tor"]
_CHAR_SUF = ["dric", "mor", "wyn", "dan", "ric", "dor", "mir", "grim",
             "thas", "bard"]
_ALIAS_PRE = ["Storm", "Oak", "Iron", "Raven", "Thorn", "Ash", "Frost",
              "Ember", "Night", "Dawn", "Swift", "Stone", "Wolf", "Hawk",
              "Grim", "True", "Wild", "Keen", "Bright", "Pine"]
_ALIAS_SUF = ["crow", "shield", "fist", "cloak", "born", "song", "ward",
              "blade", "step", "heart"]
_PLACE_PRE = ["Mire", "Karth", "Vael", "Dun", "Esk", "Fal", "Gor", "Hav",
              "Ilm", "Jarn", "Krag", "Lun", "Myr", "Nim", "Ost"]
_PLACE_SUF = ["wood", "hold", "fell", "mere", "gard", "heim", "dale", "moor"]
_OBJ_PRE = ["Sun", "Moon", "Star", "Fire", "Ice", "Wind", "Sea", "Sky",
            "War", "Rune"]
_OBJ_SUF = ["stone", "ring", "blade", "horn", "crown", "lamp", "harp", "orb"]

_UNKNOWN_PRE = ["Zan", "Yor", "Xim", "Wex", "Vos", "Ulm", "Tev", "Syl",
                "Rho", "Qar"]
_UNKNOWN_SUF = ["bek", "dal", "fin", "gos", "hul", "jat"]

_MODULES = ["core", "utils", "storage", "render", "engine", "parser",
            "index", "cache", "net", "auth", "db", "config", "log",
            "queue", "sched", "codec", "proto", "shard", "merge", "scan"]
_FUNCS = ["run", "init", "load", "save", "flush", "emit", "scan", "merge",
          "split", "apply", "check", "build", "close", "open", "push",
          "pull", "send", "recv", "pack", "unpack"]

_FILLER = ("the road was long and the grass grew tall under a pale sky . "
           "rain fell upon the hills and the wind carried no sound . "
           "night came slowly over the quiet valley and all was still").split()



# Deterministic chronicle planted into every prose file — guaranteed
# evidence for the lore_check claim routing (see queries.lore_claims).
# "Vexoraq"/"Sunlamp" are deliberately outside every pool so their event
# history is exactly the planted one (checked in _assert_fuzzy_guarantees
# via PLANTED_STRANGERS).
CHRONICLE = ("Aldric met Beldric. Cordric killed the Sunstone. "
             "In the First Age, year 100, Fendric destroyed the "
             "Starstone. In the Second Age, year 50, Galdric destroyed "
             "the Starstone. In the Third Age, year 10, Vexoraq "
             "destroyed the Sunlamp. "
             "Only Eldric can wield the Moonstone. "
             "By ancient custom the folk of Durdric always honor the "
             "oath.")
CHRONICLE_TRUTH = (
    ("aldric", "MET", "beldric"),
    ("cordric", "KILLED", "sunstone"),
    ("fendric", "DESTROYED", "starstone"),
    ("galdric", "DESTROYED", "starstone"),
    ("vexoraq", "DESTROYED", "sunlamp"),
)
PLANTED_STRANGERS = ("Vexoraq", "Sunlamp", "Zzyxqv", "Qqtplo")

def _combos(pres: list[str], sufs: list[str], n: int) -> list[str]:
    out = []
    for s in sufs:
        for p in pres:
            out.append(p + s)
            if len(out) == n:
                return out
    return out


def build_entity_pools() -> dict:
    """Deterministic entity pools + alias table rows.

    Characters: 60 (every 3rd has one alias). Places: 30. Objects: 20.
    Unknowns: 30 names NOT in the alias table (Tom-Bombadil class,
    tests/test_extract.py:132-138 analog); every 5th unknown gets an alias
    bound only by in-text alias statements (union-find must merge them).
    """
    chars = _combos(_CHAR_PRE, _CHAR_SUF, 60)
    aliases = _combos(_ALIAS_PRE, _ALIAS_SUF, 60)
    places = _combos(_PLACE_PRE, _PLACE_SUF, 30)
    objects = _combos(_OBJ_PRE, _OBJ_SUF, 20)
    unknowns = _combos(_UNKNOWN_PRE, _UNKNOWN_SUF, 30)

    alias_rows = []            # (entity_id, canonical_name, aliases, entity_type)
    char_forms: list[list[str]] = []   # surface forms per character
    for i, name in enumerate(chars):
        al = [aliases[i]] if i % 3 == 0 else []
        alias_rows.append((slugify(name), name, al, "character"))
        char_forms.append([name] + al)
    for name in places:
        alias_rows.append((slugify(name), name, [], "place"))
    for name in objects:
        alias_rows.append((slugify(name), name, [], "object"))

    unknown_forms: list[list[str]] = []
    unknown_alias_pairs: list[tuple[str, str]] = []
    for i in range(0, len(unknowns), 2):
        if i + 1 < len(unknowns) and (i // 2) % 5 == 0:
            # canonical form = lexicographic min, matching the engine's
            # order-independent union-find representative (SURVEY.md C4)
            a, b = sorted((unknowns[i], unknowns[i + 1]))
            unknown_forms.append([a, b])
            unknown_alias_pairs.append((a, b))
        else:
            unknown_forms.append([unknowns[i]])
            if i + 1 < len(unknowns):
                unknown_forms.append([unknowns[i + 1]])

    # C7 conflict source: a few unknown names are tied to SEED characters
    # by alias statements emitted in every prose file (deterministic, so
    # the union-find merge is guaranteed).  The merged node then carries
    # both 'unknown' (new-mention) and 'character' (seed) observations —
    # the type-conflict the reference records (corpus/resolver.py:328-339).
    unknown_seed_aliases: list[tuple[str, str]] = []   # (unknown, seed name)
    unknown_seed_map: dict[str, str] = {}              # unknown → seed id
    singles = [f[0] for f in unknown_forms if len(f) == 1]
    for j in (1, 5, 9):
        un, seed = singles[j], chars[(j * 13) % len(chars)]
        unknown_seed_aliases.append((un, seed))
        unknown_seed_map[un] = slugify(seed)

    # J2 fuzzy ground truth: misspelled surfaces (middle char dropped) for
    # every 4th character — the engine must resolve them to the seed via
    # the Indel-ratio ≥ 85 tier.  Generation-time assertions guarantee the
    # engine rule (exact Indel over all alias keys) and the SQL-oracle rule
    # (unique single-deletion neighbor) agree on this corpus.
    char_typos: dict[str, str] = {}
    for i, name in enumerate(chars):
        if i % 4 == 2 and len(name) >= 7:
            mid = len(name) // 2
            char_typos[name] = name[:mid] + name[mid + 1:]
    _assert_fuzzy_guarantees(alias_rows, char_typos, unknown_forms)

    return {
        "chars": chars, "char_forms": char_forms, "places": places,
        "objects": objects, "unknown_forms": unknown_forms,
        "unknown_alias_pairs": unknown_alias_pairs, "alias_rows": alias_rows,
        "unknown_seed_aliases": unknown_seed_aliases,
        "unknown_seed_map": unknown_seed_map,
        "char_typos": char_typos,
    }


def _is_one_deletion(short: str, long: str) -> bool:
    """True iff ``short`` == ``long`` minus exactly one char."""
    if len(short) != len(long) - 1:
        return False
    i = 0
    while i < len(short) and short[i] == long[i]:
        i += 1
    return short[i:] == long[i + 1:]


def _assert_fuzzy_guarantees(alias_rows, char_typos, unknown_forms) -> None:
    """Enforce at generation time that the fuzzy tier's behavior on this
    corpus is exactly the planned typo→seed links — under BOTH the
    engine's rule (max Indel ratio ≥ 85 over all alias keys) and the SQL
    oracle's rule (unique single-deletion neighbor)."""
    from raykg.functions.textnorm import fuzzy_ratio, norm_key
    keys = set()
    for _eid, name, aliases, _t in alias_rows:
        keys.add(norm_key(name))
        for a in aliases:
            keys.add(norm_key(a))
    for intended, typo in char_typos.items():
        tk, ik = norm_key(typo), norm_key(intended)
        assert tk not in keys, (typo, "collides with an alias key")
        above = sorted((k for k in keys if fuzzy_ratio(tk, k) >= 85.0))
        assert above == [ik], (typo, above)
        dels = sorted(k for k in keys if _is_one_deletion(tk, k))
        assert dels == [ik], (typo, dels)
    for forms in list(unknown_forms) + [[w] for w in PLANTED_STRANGERS]:
        for u in forms:
            uk = norm_key(u)
            assert all(fuzzy_ratio(uk, k) < 85.0 for k in keys), u
            assert not any(_is_one_deletion(uk, k) for k in keys), u


# Verb-phrase categories: subject is always a character.
PP_VERBS = [v for v, p in vocab.VERB_PHRASE_TO_PRED.items() if p in (
    "SPOKE_TO", "SPOKE_WITH", "TRAVELED_WITH", "FOUGHT", "FOUGHT_AGAINST",
    "ALLIED_WITH", "BETRAYED", "HELPED", "CAPTURED", "FREED", "KILLED",
    "MET", "SERVES", "LEADS")]
PL_VERBS = [v for v, p in vocab.VERB_PHRASE_TO_PRED.items() if p in (
    "TRAVELED_TO", "ENTERED", "LEFT", "LIVES_IN", "VISITED", "RULES",
    "GUARDS")]
PO_VERBS = [v for v, p in vocab.VERB_PHRASE_TO_PRED.items() if p in (
    "POSSESSES", "GAVE", "RECEIVED", "FOUND", "LOST", "STOLE", "USED",
    "CREATED", "DESTROYED")]
for _lst in (PP_VERBS, PL_VERBS, PO_VERBS):
    _lst.sort()


def _zipf_probs(n: int, a: float = 1.1) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1) ** a
    return p / p.sum()


class _FileGen:
    """Deterministic generator for one corpus file."""

    def __init__(self, pools: dict, idx: int):
        self.pools = pools
        self.rng = np.random.RandomState((1_000_003 * idx + 42) % (2**31 - 1))
        self.truth: list[tuple[str, str, str]] = []   # (subj_id, pred, obj_id)
        n_char = len(pools["char_forms"])
        self._pc = _zipf_probs(n_char)
        self._pp = _zipf_probs(len(pools["places"]))
        self._po = _zipf_probs(len(pools["objects"]))
        self._pu = _zipf_probs(len(pools["unknown_forms"]))

    # -- entity picks (return (surface_form, canonical_entity_id)) --
    def pick_char(self) -> tuple[str, str]:
        if self.rng.rand() < 0.12:
            # Unknown entities always use their canonical surface: their alias
            # form is only linkable through an alias statement, which may not
            # be sampled into this corpus.
            forms = self.pools["unknown_forms"][
                self.rng.choice(len(self.pools["unknown_forms"]), p=self._pu)]
            # conflict unknowns resolve (via the guaranteed alias
            # statement + union-find) to their seed character
            cid = self.pools["unknown_seed_map"].get(
                forms[0], slugify(forms[0]))
            return forms[0], cid
        forms = self.pools["char_forms"][
            self.rng.choice(len(self.pools["char_forms"]), p=self._pc)]
        typo = self.pools["char_typos"].get(forms[0])
        if typo is not None and self.rng.rand() < 0.12:
            # misspelled sighting — the engine's fuzzy tier (Indel ≥ 85)
            # must resolve it back to the seed entity
            return typo, slugify(forms[0])
        surface = forms[0] if (len(forms) == 1 or self.rng.rand() < 0.7) else forms[1]
        return surface, slugify(forms[0])

    def pick_place(self) -> tuple[str, str]:
        name = self.pools["places"][self.rng.choice(len(self.pools["places"]), p=self._pp)]
        return name, slugify(name)

    def pick_obj(self) -> tuple[str, str]:
        name = self.pools["objects"][self.rng.choice(len(self.pools["objects"]), p=self._po)]
        return name, slugify(name)

    # -- sentence templates --
    def sent_relation(self) -> str:
        kind = self.rng.choice(3, p=[0.5, 0.3, 0.2])
        s, sid = self.pick_char()
        if kind == 0:
            verb = PP_VERBS[self.rng.randint(len(PP_VERBS))]
            o, oid = self.pick_char()
            while oid == sid:
                o, oid = self.pick_char()
            text = f"{s} {verb} {o}."
        elif kind == 1:
            verb = PL_VERBS[self.rng.randint(len(PL_VERBS))]
            o, oid = self.pick_place()
            art = "the " if self.rng.rand() < 0.3 else ""
            text = f"{s} {verb} {art}{o}."
        else:
            verb = PO_VERBS[self.rng.randint(len(PO_VERBS))]
            o, oid = self.pick_obj()
            text = f"{s} {verb} the {o}."
        self.truth.append((sid, vocab.VERB_PHRASE_TO_PRED[verb], oid))
        return text

    def sent_cooccur(self) -> str:
        a, _ = self.pick_char()
        b, _ = self.pick_char()
        p, _ = self.pick_place()
        return f"{a} and {b} waited near {p}."

    def sent_dialogue(self) -> str:
        s, _ = self.pick_char()
        verb = vocab.SPEECH_VERBS[self.rng.randint(len(vocab.SPEECH_VERBS))]
        quotes = ['"We must go at once,"', '"It is too late,"',
                  '"Who walks there?"', '"Hold the gate!"',
                  '"The night is cold,"',
                  '"I\'ll guard the door myself,"',
                  '"You\'d best rest now, I think,"',
                  '"Nay, I will not yield!"',
                  '"Behold the dawn, my friend,"',
                  '"You\'re certain of it?"']
        q = quotes[self.rng.randint(len(quotes))]
        # extended quote tiers (reference voice/dialogue.py:148-156):
        # ~25% of dialogue units use a curly-double / straight-single /
        # curly-single / mojibake quote style.  Content for the
        # single-quote styles is apostrophe-free (the reference's own
        # "be careful - apostrophes" hazard) and every dialogue unit
        # carries exactly ONE quote span.
        style = self.rng.rand()
        if style < 0.75 or "'" in s:
            return f"{q} {verb} {s}."
        alt = ["We must go at once,", "It is too late,", "Hold the gate!",
               "The night is cold,", "Who walks there?"]
        a = alt[self.rng.randint(len(alt))]
        if style < 0.82:
            return f"“{a}” {verb} {s}."     # tier 2 curly double
        if style < 0.89:
            return f"'{a}' {verb} {s}."               # tier 3 single
        if style < 0.96:
            return f"‘{a}’ {verb} {s}."     # tier 4 curly single
        # tier 6 mojibake: content starts LOWERCASE — 'œ' is a Unicode
        # letter, so Python's \b (Unicode) and DuckDB's RE2 \b (ASCII)
        # disagree about a capital letter glued to it; a lowercase first
        # word keeps the cap-token scans identical on both sides
        return f"â€œ{a[0].lower()}{a[1:]}â€ {verb} {s}."

    def sent_alias(self) -> str:
        pairs = []
        for i, forms in enumerate(self.pools["char_forms"]):
            if len(forms) > 1:
                pairs.append((forms[0], forms[1]))
        pairs += self.pools["unknown_alias_pairs"]
        a, b = pairs[self.rng.randint(len(pairs))]
        return f"{a}, also known as {b}, rested awhile."

    def sent_temporal(self) -> str:
        era = vocab.ERAS[self.rng.randint(len(vocab.ERAS))]
        year = int(self.rng.randint(1, 3000))
        s, sid = self.pick_char()
        o, oid = self.pick_obj()
        self.truth.append((sid, "DESTROYED", oid))
        return f"In the {era} Age, year {year}, {s} destroyed the {o}."

    def sent_lifespan(self) -> str:
        """Temporal lifespan sentence exercising the reference
        BIRTH/DEATH/LIVED pattern sets (lore/temporal.py:256-269).
        Deliberately includes shapes that trigger the reference's own
        capture quirks ("was born" / "the world" pseudo-entities via the
        generic LIVED pattern) — the engine must reproduce them."""
        s, sid = self.pick_char()
        era = vocab.ERAS[self.rng.randint(len(vocab.ERAS))]
        k = self.rng.randint(6)
        if k == 0:
            return f"{s} was born in the {era} Age."
        if k == 1:
            return f"{s} came into the world in the {era} Age."
        if k == 2:
            return f"{s} perished in the {era} Age."
        if k == 3:
            return f"Men still mourn the death of {s} in the {era} Age."
        # "dwelt in"/"lived in" are ALSO SVO verb phrases (LIVES_IN): the
        # relationship extractor legitimately emits (char, LIVES_IN, <era
        # word>) — the capitalized era word becomes a new-entity object —
        # so record that triple as truth to keep P/R exact
        self.truth.append((sid, "LIVES_IN", era.lower()))
        if k == 4:
            return f"{s} dwelt in the {era} Age."
        return f"{s} lived in the {era} Age."

    def sent_order(self) -> str:
        """Temporal ordering sentence (ORDER_PATTERNS,
        lore/temporal.py:276-281)."""
        a, aid = self.pick_char()
        b, bid = self.pick_char()
        while bid == aid:
            b, bid = self.pick_char()
        k = self.rng.randint(4)
        if k == 0:
            return f"{a} came before {b}."
        if k == 1:
            return f"{a} came after {b}."
        if k == 2:
            return f"{a} preceded {b}."
        # "followed" is also an SVO verb phrase (TRAVELED_WITH) — truth it
        self.truth.append((aid, "TRAVELED_WITH", bid))
        return f"{a} followed {b}."

    def sent_title(self) -> str:
        title = vocab.TITLES[self.rng.randint(len(vocab.TITLES))]
        s, _ = self.pick_char()
        return f"{title} {s} rode onward without rest."

    def sent_rule(self) -> str:
        """World-building rule sentence (worldbible/patterns.py:90-105
        rule-shaped statements analog)."""
        k = self.rng.randint(5)
        o, _ = self.pick_obj()
        p, _ = self.pick_place()
        s, _ = self.pick_char()
        first = s.split(" ")[0]
        if k == 0:
            return f"Only {first} can wield the {o}."
        if k == 1:
            return f"No one may enter {p} after dark."
        if k == 2:
            return f"The {o} must never leave {p}."
        if k == 3:
            # magic-limitation shape (A16: 'forbidden' + power keyword)
            return f"The {o} is forbidden power and must never leave {p}."
        return f"By ancient custom the folk of {p} always honor the oath."

    def sent_geo(self) -> str:
        """A16 geography shape: '<Place> lies near <Place>' + a geography
        keyword so the unit categorizes as geography."""
        p1, _ = self.pick_place()
        p2, _ = self.pick_place()
        while p2 == p1:
            p2, _ = self.pick_place()
        return f"{p1} lies near {p2} beyond the old gate."

    def sent_filler(self) -> str:
        n = self.rng.randint(6, 14)
        idx = self.rng.randint(0, len(_FILLER), size=n)
        words = [_FILLER[i] for i in idx if _FILLER[i] != "."]
        if self.rng.rand() < 0.1:
            words.append(vocab.ARCHAISMS[self.rng.randint(len(vocab.ARCHAISMS))])
        if self.rng.rand() < 0.05:
            words.insert(min(2, len(words)), "Mr. Baggins")
        txt = " ".join(words)
        return "The " + txt + "."

    def sentence(self) -> str:
        r = self.rng.rand()
        if r < 0.30:
            return self.sent_relation()
        if r < 0.42:
            return self.sent_cooccur()
        if r < 0.54:
            return self.sent_dialogue()
        if r < 0.60:
            return self.sent_alias()
        if r < 0.68:
            return self.sent_temporal()
        if r < 0.73:
            return self.sent_title()
        if r < 0.78:
            return self.sent_rule()
        if r < 0.83:
            return self.sent_geo()
        if r < 0.88:
            return self.sent_lifespan()
        if r < 0.91:
            return self.sent_order()
        return self.sent_filler()

    def prose_content(self) -> str:
        paras: list[str] = []
        n_paras = int(self.rng.randint(12, 21))
        chapter = 0
        # guaranteed conflict alias statements (every file → every corpus
        # sample merges these unknowns into their seed characters)
        lore = " ".join(f"{u}, also known as {s}, rested awhile."
                        for u, s in self.pools["unknown_seed_aliases"])
        # deterministic chronicle: plants the evidence the lore_check
        # claim set routes against (relationship, events with eras, a
        # capability rule, an attribute rule) — every claim-type branch
        # has guaranteed, order-independent evidence
        chron = CHRONICLE
        for sid, pred, oid in CHRONICLE_TRUTH:
            self.truth.append((sid, pred, oid))
        for p in range(n_paras):
            if p % 6 == 0:
                chapter += 1
                # the reference header regex's trailing ``\s*.*`` consumes
                # the line after the header — give it a sacrificial line
                # with no extractable content so no truth is lost
                paras.append(f"Chapter {chapter}\n"
                             "the watch turned at dusk and none spoke")
            n_sent = int(self.rng.randint(3, 7))
            paras.append(" ".join(self.sentence() for _ in range(n_sent)))
        paras.append(lore)
        paras.append(chron)
        return "\n\n".join(paras) + "\n"

    def code_content(self, modname: str) -> str:
        rng = self.rng
        n_imp = int(rng.randint(2, 5))
        imported: list[tuple[str, str]] = []   # (local_name, module)
        lines: list[str] = [f"# module {modname}"]
        mods = list(rng.choice(len(_MODULES), size=n_imp, replace=False))
        for k, mi in enumerate(mods):
            m = _MODULES[mi]
            if m == modname:
                continue
            if k == 1:
                local = m[:2] + "x"
                lines.append(f"import {m} as {local}")
                imported.append((local, m))
                self.truth.append((modname, "ALIASES", m))
            else:
                lines.append(f"import {m}")
                imported.append((m, m))
            self.truth.append((modname, "IMPORTS", m))
        lines.append("")
        n_defs = int(rng.randint(2, 5))
        defs = list(rng.choice(len(_FUNCS), size=n_defs, replace=False))
        def_names = [f"{_FUNCS[d]}_{int(rng.randint(100))}" for d in defs]
        for dn in def_names:
            self.truth.append((modname, "DEFINES", f"{modname}.{dn}"))
            lines.append(f"def {dn}():")
            n_calls = int(rng.randint(1, 4))
            for _ in range(n_calls):
                local, target = imported[int(rng.randint(len(imported)))]
                fn = _FUNCS[int(rng.randint(len(_FUNCS)))]
                lines.append(f"    {local}.{fn}()")
                self.truth.append((f"{modname}.{dn}", "CALLS", f"{target}.{fn}"))
            lines.append("")
        return "\n".join(lines)


def sf_tag_of(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def n_files_for(sf_tag: str) -> int:
    m = re.match(r"sf([0-9.]+)", sf_tag)
    sf = float(m.group(1)) if m else 0.001
    return int(min(200000, max(20, round(20000 * sf))))


def corpus_dir(sf_dir: str) -> str:
    return os.path.join(CACHE_ROOT, f"v{GEN_VERSION}", sf_tag_of(sf_dir))


def _gen_chunk(pools: dict, lo: int, hi: int, n_repos: int
               ) -> tuple[pa.Table, list]:
    """Generate files [lo, hi) — a pure function of (pools, index), so
    chunks can run as parallel Ray tasks with identical output."""
    repos, paths, commits, langs, contents = [], [], [], [], []
    truth_rows: list[tuple[str, str, str, str]] = []
    for i in range(lo, hi):
        g = _FileGen(pools, i)
        repo = f"acme/repo{i % n_repos:03d}"
        is_code = (i % 10) >= 7      # 30% code files
        if is_code:
            modname = f"mod{i:05d}"
            path = f"src/{modname}.py"
            content = g.code_content(modname)
            lang = "py"
        else:
            path = f"text/part{i:05d}.txt"
            content = g.prose_content()
            lang = "txt"
        repos.append(repo)
        paths.append(path)
        commits.append(sha256_hex(repo)[:40])
        langs.append(lang)
        contents.append(content)
        for s, p, o in g.truth:
            truth_rows.append((path, s, p, o))
    tbl = pa.table({
        "repo": pa.array(repos, pa.string()),
        "path": pa.array(paths, pa.string()),
        "commit": pa.array(commits, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "content": pa.array(contents, pa.string()),
    })
    return tbl, truth_rows


def _generate_chunks(pools: dict, n: int, n_repos: int,
                     chunk: int | None = None) -> list[tuple[pa.Table, list]]:
    """Deterministic corpus chunks; parallel Ray tasks when a Ray session
    exists (generation is per-index pure), serial otherwise.  Chunking
    guarantees >= 8 corpus part files even at tiny scale factors so the
    per-partition resume path always has real partitions to skip."""
    if chunk is None:
        chunk = max(3, min(2000, -(-n // 8)))
    bounds = [(lo, min(lo + chunk, n)) for lo in range(0, n, chunk)]
    try:
        import ray
        if ray.is_initialized() and len(bounds) > 1:
            fn = ray.remote(_gen_chunk)
            return ray.get([fn.remote(pools, lo, hi, n_repos)
                            for lo, hi in bounds])
    except Exception:
        pass
    return [_gen_chunk(pools, lo, hi, n_repos) for lo, hi in bounds]


def generate(sf_dir: str, force: bool = False) -> str:
    """Generate (or reuse cached) corpus/alias/truth parquet for an sf dir.

    Returns the cache directory containing ``corpus.parquet``,
    ``alias_table.parquet`` and ``truth_triples.parquet``.
    """
    out = corpus_dir(sf_dir)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker) and not force:
        return out
    os.makedirs(out, exist_ok=True)
    pools = build_entity_pools()
    n = n_files_for(sf_tag_of(sf_dir))
    n_repos = max(4, n // 40)

    chunks = _generate_chunks(pools, n, n_repos)
    truth_rows = [r for c in chunks for r in c[1]]
    # one file per chunk with normal row groups — a single file with tiny
    # row groups made every Ray read task re-parse a 40k-row-group footer
    # (the units stage was 100% serial because of it)
    cdir = os.path.join(out, "corpus.parquet")
    os.makedirs(cdir, exist_ok=True)
    for ci, (tbl, _) in enumerate(chunks):
        pq.write_table(tbl, os.path.join(cdir, f"part-{ci:05d}.parquet"),
                       row_group_size=256)

    ar = pools["alias_rows"]
    alias_tbl = pa.table({
        "entity_id": pa.array([r[0] for r in ar], pa.string()),
        "canonical_name": pa.array([r[1] for r in ar], pa.string()),
        "aliases": pa.array([r[2] for r in ar], pa.list_(pa.string())),
        "entity_type": pa.array([r[3] for r in ar], pa.string()),
    })
    pq.write_table(alias_tbl, os.path.join(out, "alias_table.parquet"))

    truth = pa.table({
        "path": pa.array([r[0] for r in truth_rows], pa.string()),
        "subj": pa.array([r[1] for r in truth_rows], pa.string()),
        "pred": pa.array([r[2] for r in truth_rows], pa.string()),
        "obj": pa.array([r[3] for r in truth_rows], pa.string()),
    })
    pq.write_table(truth, os.path.join(out, "truth_triples.parquet"))

    with open(marker, "w") as f:
        f.write(f"n_files={n}\n")
    return out
