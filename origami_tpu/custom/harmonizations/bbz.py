"""BBZ (Fraktur newspaper) harmonization schema.

Handles the long-s, rotunda-r, Fraktur ligatures and historic quote
conventions of 19th-century German newspaper transcriptions (role of the
reference's BBZ schema, origami/custom/harmonizations/bbz.py — rules
re-authored). Two channels: "fraktur" keeps historic glyphs, "modern"
folds them to contemporary German."""

SCHEMA = {
    "channels": {
        "fraktur": {
            "transform": "fraktur",
            "alphabet": None,
            "tests": ["fraktur"],
        },
        "modern": {
            "transform": "modern",
            "alphabet": None,
            "tests": ["modern"],
        },
        "default": {
            "transform": "fraktur",
            "alphabet": None,
            "tests": [],
        },
    },
    "tests": {
        "fraktur": [
            ("Caſſa  Bericht", "Caſſa Bericht"),
            ("Börſe ,  Berlin", "Börſe, Berlin"),
        ],
        "modern": [
            ("Caſſa", "Cassa"),
            ("Actiengeſellſchaft", "Actiengesellschaft"),
            ("Wien ⸗ Brief", "Wien-Brief"),
        ],
    },
    "transforms": {
        "base": [
            ("unicode", "NFC"),
            ("str", "⸗", "-"),
            ("str", "—", "-"),
            ("re", r"\s+", " "),
            ("re", r"\s*([,;:.!?])\s*", r"\1 "),
            ("re", r"(\d) *([,%-]+) *(\d)", r"\1\2\3"),
            ("re", r"\( +", "("),
            ("re", r" +\)", ")"),
            ("re", r" *- *", "-"),
        ],
        "fraktur": [
            ("tfm", "base"),
        ],
        "modern": [
            ("tfm", "base"),
            ("str", "ſ", "s"),
            ("str", "ꝛ", "r"),
            ("str", "æ", "ae"),
            ("str", "œ", "oe"),
        ],
    },
}
