"""Colour normalization + contrast (reference P8/P13 semantics).

- OSM ``colour`` tags are hex (``#1779c2``, ``#abc``) or CSS3 names
  (``red``); the reference normalizes via webcolors
  (osm_connector.py:343-355) and strips the leading ``#`` when writing
  GTFS (routes_creator.py:102-107 — note it strips the first character
  unconditionally, which we reproduce verbatim).
- Text colour: ``ref:colour_tx`` tag wins, else perceived brightness
  ``sqrt(.241 r² + .691 g² + .068 b²) ≤ 130 → white else black``
  (helper.py:96-114).

The name table is the public CSS3 extended-colour list (the same data
webcolors ships). Normalization is a broadcast join against this
149-row table + column ops — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# CSS3 extended color keywords (W3C CSS Color Module Level 3, §4.3)
CSS3_NAMES_TO_HEX: dict[str, str] = {
    "aliceblue": "#f0f8ff", "antiquewhite": "#faebd7", "aqua": "#00ffff",
    "aquamarine": "#7fffd4", "azure": "#f0ffff", "beige": "#f5f5dc",
    "bisque": "#ffe4c4", "black": "#000000", "blanchedalmond": "#ffebcd",
    "blue": "#0000ff", "blueviolet": "#8a2be2", "brown": "#a52a2a",
    "burlywood": "#deb887", "cadetblue": "#5f9ea0", "chartreuse": "#7fff00",
    "chocolate": "#d2691e", "coral": "#ff7f50", "cornflowerblue": "#6495ed",
    "cornsilk": "#fff8dc", "crimson": "#dc143c", "cyan": "#00ffff",
    "darkblue": "#00008b", "darkcyan": "#008b8b", "darkgoldenrod": "#b8860b",
    "darkgray": "#a9a9a9", "darkgrey": "#a9a9a9", "darkgreen": "#006400",
    "darkkhaki": "#bdb76b", "darkmagenta": "#8b008b", "darkolivegreen": "#556b2f",
    "darkorange": "#ff8c00", "darkorchid": "#9932cc", "darkred": "#8b0000",
    "darksalmon": "#e9967a", "darkseagreen": "#8fbc8f", "darkslateblue": "#483d8b",
    "darkslategray": "#2f4f4f", "darkslategrey": "#2f4f4f", "darkturquoise": "#00ced1",
    "darkviolet": "#9400d3", "deeppink": "#ff1493", "deepskyblue": "#00bfff",
    "dimgray": "#696969", "dimgrey": "#696969", "dodgerblue": "#1e90ff",
    "firebrick": "#b22222", "floralwhite": "#fffaf0", "forestgreen": "#228b22",
    "fuchsia": "#ff00ff", "gainsboro": "#dcdcdc", "ghostwhite": "#f8f8ff",
    "gold": "#ffd700", "goldenrod": "#daa520", "gray": "#808080",
    "grey": "#808080", "green": "#008000", "greenyellow": "#adff2f",
    "honeydew": "#f0fff0", "hotpink": "#ff69b4", "indianred": "#cd5c5c",
    "indigo": "#4b0082", "ivory": "#fffff0", "khaki": "#f0e68c",
    "lavender": "#e6e6fa", "lavenderblush": "#fff0f5", "lawngreen": "#7cfc00",
    "lemonchiffon": "#fffacd", "lightblue": "#add8e6", "lightcoral": "#f08080",
    "lightcyan": "#e0ffff", "lightgoldenrodyellow": "#fafad2", "lightgray": "#d3d3d3",
    "lightgrey": "#d3d3d3", "lightgreen": "#90ee90", "lightpink": "#ffb6c1",
    "lightsalmon": "#ffa07a", "lightseagreen": "#20b2aa", "lightskyblue": "#87cefa",
    "lightslategray": "#778899", "lightslategrey": "#778899", "lightsteelblue": "#b0c4de",
    "lightyellow": "#ffffe0", "lime": "#00ff00", "limegreen": "#32cd32",
    "linen": "#faf0e6", "magenta": "#ff00ff", "maroon": "#800000",
    "mediumaquamarine": "#66cdaa", "mediumblue": "#0000cd", "mediumorchid": "#ba55d3",
    "mediumpurple": "#9370db", "mediumseagreen": "#3cb371", "mediumslateblue": "#7b68ee",
    "mediumspringgreen": "#00fa9a", "mediumturquoise": "#48d1cc", "mediumvioletred": "#c71585",
    "midnightblue": "#191970", "mintcream": "#f5fffa", "mistyrose": "#ffe4e1",
    "moccasin": "#ffe4b5", "navajowhite": "#ffdead", "navy": "#000080",
    "oldlace": "#fdf5e6", "olive": "#808000", "olivedrab": "#6b8e23",
    "orange": "#ffa500", "orangered": "#ff4500", "orchid": "#da70d6",
    "palegoldenrod": "#eee8aa", "palegreen": "#98fb98", "paleturquoise": "#afeeee",
    "palevioletred": "#db7093", "papayawhip": "#ffefd5", "peachpuff": "#ffdab9",
    "peru": "#cd853f", "pink": "#ffc0cb", "plum": "#dda0dd",
    "powderblue": "#b0e0e6", "purple": "#800080", "red": "#ff0000",
    "rosybrown": "#bc8f8f", "royalblue": "#4169e1", "saddlebrown": "#8b4513",
    "salmon": "#fa8072", "sandybrown": "#f4a460", "seagreen": "#2e8b57",
    "seashell": "#fff5ee", "sienna": "#a0522d", "silver": "#c0c0c0",
    "skyblue": "#87ceeb", "slateblue": "#6a5acd", "slategray": "#708090",
    "slategrey": "#708090", "snow": "#fffafa", "springgreen": "#00ff7f",
    "steelblue": "#4682b4", "tan": "#d2b48c", "teal": "#008080",
    "thistle": "#d8bfd8", "tomato": "#ff6347", "turquoise": "#40e0d0",
    "violet": "#ee82ee", "wheat": "#f5deb3", "white": "#ffffff",
    "whitesmoke": "#f5f5f5", "yellow": "#ffff00", "yellowgreen": "#9acd32",
}


def color_lookup_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(CSS3_NAMES_TO_HEX.items()), "color_name string, color_hex string"
    )


def normalize_colour(df: DataFrame, colour_col: str, out_col: str) -> DataFrame:
    """webcolors semantics: valid hex → lowercased/expanded; known name →
    hex; anything else left untouched (osm_connector.py:343-355)."""
    spark = df.sparkSession
    lut = F.broadcast(color_lookup_df(spark))
    c = F.col(colour_col)
    is_hex6 = c.rlike(r"^#[0-9a-fA-F]{6}$")
    is_hex3 = c.rlike(r"^#[0-9a-fA-F]{3}$")
    expand3 = F.concat(
        F.lit("#"),
        *[
            F.repeat(F.lower(F.substring(c, i, 1)), 2)
            for i in (2, 3, 4)
        ],
    )
    df = df.join(lut, F.lower(c) == lut.color_name, "left")
    return df.withColumn(
        out_col,
        F.when(is_hex6, F.lower(c))
        .when(is_hex3, expand3)
        .when(F.col("color_hex").isNotNull(), F.col("color_hex"))
        .otherwise(c),
    ).drop("color_name", "color_hex")


def contrast_text_colour(hex_with_hash: Column) -> Column:
    """P13 (helper.py:96-114): perceived brightness → '#ffffff'/'#000000'."""
    r = F.conv(F.substring(hex_with_hash, 2, 2), 16, 10).cast("double")
    g = F.conv(F.substring(hex_with_hash, 4, 2), 16, 10).cast("double")
    b = F.conv(F.substring(hex_with_hash, 6, 2), 16, 10).cast("double")
    brightness = F.sqrt(r * r * 0.241 + g * g * 0.691 + b * b * 0.068)
    return F.when(brightness <= 130, "#ffffff").otherwise("#000000")
