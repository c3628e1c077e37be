"""Language-ID classifier quality on a real multilingual fixture.

(The driver's synthetic corpus assigns `lang` labels randomly over
English-ish word soup, so label agreement there is meaningless; the
differential oracle covers determinism, this covers classification.)"""

from __future__ import annotations

from near_real_time_data_warehouse_spark.operators.text import lang_id_df

SENTENCES = [
    ("en", "the cat was sitting with the dog and the bird of the house"),
    ("en", "this is the report of the year and it was written with care"),
    ("de", "der hund und die katze sind nicht ein problem in der stadt"),
    ("de", "das ist nicht der beste tag und die sonne ist nicht da"),
    ("es", "el perro y los gatos son una parte que es muy importante"),
    ("es", "las casas y el parque son una zona que es muy tranquila"),
    ("fr", "le chien et les chats sont dans une maison pour le moment"),
    ("fr", "les rues et le marche sont dans une ville pour les gens"),
    ("zh", "这是一个关于数据仓库的报告"),
    ("zh", "流处理和批处理在一个引擎中"),
]


def test_lang_id_classifies_real_text(spark):
    df = spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in enumerate(SENTENCES)],
        "doc_id long, lang string, text string",
    )
    rows = lang_id_df(df).collect()
    wrong = [(r.labeled_lang, r.predicted_lang) for r in rows
             if r.predicted_lang != r.labeled_lang]
    assert not wrong, wrong
