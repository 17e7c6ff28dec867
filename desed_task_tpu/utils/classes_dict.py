"""DCASE Task 4 class vocabularies (data constants, not code).

The label sets and cross-dataset aliases defined by the challenge
(recipes/dcase2024_task4_baseline/local/classes_dict.py:7-77 in the
reference; the 10 DESED classes are shared by all 2021-2024 recipes).
"""

from collections import OrderedDict

CLASSES_DESED = OrderedDict(
    (name, i)
    for i, name in enumerate(
        [
            "Alarm_bell_ringing",
            "Blender",
            "Cat",
            "Dishes",
            "Dog",
            "Electric_shaver_toothbrush",
            "Frying",
            "Running_water",
            "Speech",
            "Vacuum_cleaner",
        ]
    )
)

CLASSES_MAESTRO_REAL = OrderedDict(
    (name, i)
    for i, name in enumerate(
        [
            "cutlery and dishes",
            "furniture dragging",
            "people talking",
            "children voices",
            "coffee machine",
            "footsteps",
            "large_vehicle",
            "car",
            "brakes_squeaking",
            "cash register beeping",
            "announcement",
            "shopping cart",
            "metro leaving",
            "metro approaching",
            "door opens/closes",
            "wind_blowing",
            "birds_singing",
        ]
    )
)

CLASSES_MAESTRO_SYNTH = OrderedDict(
    (name, i)
    for i, name in enumerate(
        [
            "car_horn",
            "children_voices",
            "engine_idling",
            "siren",
            "street_music",
            "dog_bark",
        ]
    )
)

# 11-class MAESTRO evaluation subset
CLASSES_MAESTRO_REAL_EVAL = {
    "birds_singing",
    "car",
    "people talking",
    "footsteps",
    "children voices",
    "wind_blowing",
    "brakes_squeaking",
    "large_vehicle",
    "cutlery and dishes",
    "metro approaching",
    "metro leaving",
}

# MAESTRO -> DESED label aliases for cross-dataset event duplication
MAESTRO_DESED_ALIAS = {
    "people talking": "Speech",
    "children voices": "Speech",
    "announcement": "Speech",
    "cutlery and dishes": "Dishes",
    "dog_bark": "Dog",
}


def process_tsvs(tsv, alias_map=MAESTRO_DESED_ALIAS):
    """Duplicate aliased events under their DESED names (local/utils.py:18-31):
    each MAESTRO event whose label has a DESED alias is copied with the alias
    label so both class columns receive supervision."""
    import pandas as pd

    extra = tsv[tsv["event_label"].isin(alias_map.keys())].copy()
    extra["event_label"] = extra["event_label"].map(alias_map)
    return pd.concat([tsv, extra], ignore_index=True)
