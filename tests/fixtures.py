"""Synthetic .crs fixtures, written in the format documented in
FIXTURES.md (header grammar from /root/reference/t/data/*.crs — data
values follow the golden test scenario F1/F2 so behavior parity is
checkable against /root/reference/t/linz_bde_uploader.t:656-711 and
:1176-1221)."""

import gzip
import os

PAB1_L0 = """\
HEDR\t 2.0.0
SOFTWARE cbe_b30 V1.0.1
SCHEMA\t V1.0
USER\t crs_bde
START\t 2016-06-01 17:12:25
END\t 2016-06-01 17:12:25
SQL\t SELECT * FROM crs_parcel_bndry
TABLE\tcrs_parcel_bndry
COLUMN\t pri_id                         integer NULL
COLUMN\t sequence                       integer NULL
COLUMN\t lin_id                         integer NULL
COLUMN\t reversed                       char NULL
COLUMN\t audit_id                       integer NOT NULL
DESC
SIZE          562
{CRS-DATA}
4457328|1|29694591|Y|80401148|
4457327|2|29694578|N|80401149|
4457326|3|11960041|Y|80401150|
"""

# level-5 data: F1 edited — 2 appended rows (300/400), one re-key
# 80401150->100, two sequence updates 1->10 / 2->20 (FIXTURES.md F2).
PAB1_L5 = """\
HEDR\t 2.0.0
SOFTWARE cbe_b30 V1.0.1
SCHEMA\t V1.0
USER\t crs_bde
START\t 2016-06-01 17:12:25
END\t 2016-06-01 17:40:00
SQL\t SELECT * FROM crs_parcel_bndry
TABLE\tcrs_parcel_bndry
COLUMN\t pri_id                         integer NULL
COLUMN\t sequence                       integer NULL
COLUMN\t lin_id                         integer NULL
COLUMN\t reversed                       char NULL
COLUMN\t audit_id                       integer NOT NULL
DESC
SIZE          700
{CRS-DATA}
4457328|10|29694591|Y|80401148|
4457327|20|29694578|N|80401149|
4457326|3|11960041|Y|100|
4457330|4|29694600|N|300|
4457331|5|29694601|Y|400|
"""

XAUD = """\
HEDR\t 2.0.0
SOFTWARE cbe_b30 V1.0.1
SCHEMA\t V1.0
USER\t crs_bde
START\t 2016-06-01 17:12:46
END\t 2016-06-01 17:12:46
SQL\t SELECT * FROM cbe_data
TABLE\tcbe_data
COLUMN\t id                             integer NOT NULL
COLUMN\t tablename                      varchar NOT NULL
COLUMN\t tablekeyvalue                  integer NOT NULL
COLUMN\t action                         char NOT NULL
COLUMN\t timestamp                      datetime NOT NULL
DESC
SIZE          785
{CRS-DATA}
1|crs_parcel_bndry|80401150|D|2016-06-01 17:12:17|
2|crs_parcel_bndry|300|I|2016-06-01 17:12:17|
3|crs_parcel_bndry|400|I|2016-06-01 17:12:17|
4|crs_parcel_bndry|100|I|2016-06-01 17:12:17|
5|crs_parcel_bndry|80401148|U|2016-06-01 17:12:17|
6|crs_parcel_bndry|80401149|U|2016-06-01 17:12:17|
"""

# second level-5 dataset on top of F2's state: sequence update
# 300->40, insert 500, delete 400 (file carries the post-state rows
# for the table, like PAB1_L5)
PAB1_L5B = """\
HEDR\t 2.0.0
SOFTWARE cbe_b30 V1.0.1
SCHEMA\t V1.0
USER\t crs_bde
START\t 2016-06-01 17:40:00
END\t 2016-06-01 18:00:00
SQL\t SELECT * FROM crs_parcel_bndry
TABLE\tcrs_parcel_bndry
COLUMN\t pri_id                         integer NULL
COLUMN\t sequence                       integer NULL
COLUMN\t lin_id                         integer NULL
COLUMN\t reversed                       char NULL
COLUMN\t audit_id                       integer NOT NULL
DESC
SIZE          700
{CRS-DATA}
4457328|10|29694591|Y|80401148|
4457327|20|29694578|N|80401149|
4457326|3|11960041|Y|100|
4457330|40|29694600|N|300|
4457332|6|29694700|N|500|
"""

XAUD2 = """\
HEDR\t 2.0.0
SOFTWARE cbe_b30 V1.0.1
SCHEMA\t V1.0
USER\t crs_bde
START\t 2016-06-01 17:40:10
END\t 2016-06-01 17:40:10
SQL\t SELECT * FROM cbe_data
TABLE\tcbe_data
COLUMN\t id                             integer NOT NULL
COLUMN\t tablename                      varchar NOT NULL
COLUMN\t tablekeyvalue                  integer NOT NULL
COLUMN\t action                         char NOT NULL
COLUMN\t timestamp                      datetime NOT NULL
DESC
SIZE          785
{CRS-DATA}
1|crs_parcel_bndry|300|U|2016-06-01 17:40:05|
2|crs_parcel_bndry|500|I|2016-06-01 17:40:05|
3|crs_parcel_bndry|400|D|2016-06-01 17:40:05|
"""

UTF8 = """\
HEDR\t 2.0.0
SOFTWARE cbe_b30 V1.0.1
SCHEMA\t 3.19.14
USER\t crs_bde
START\t 2019-06-01 20:51:45
END\t 2019-07-06 20:57:38
SQL\t SELECT * FROM utf8
TABLE\t utf8
COLUMN\t id                           int NULL
COLUMN\t des                          varchar NULL
DESC
SIZE          312
{CRS-DATA}
1|♯|
2|♭|
3|♮|
4|–|
"""


def write_crs(path: str, content: str, gz: bool = False) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if gz:
        with gzip.open(path, "wt", encoding="utf-8") as fh:
            fh.write(content)
    else:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(content)
    return path


def write_repository(root: str, second_l5: bool = False) -> str:
    """Build a two-dataset BDE repository: one level_0, one level_5
    (plus, with ``second_l5``, a later level_5 applying U 300->40,
    I 500, D 400 on top of F2's golden state)."""
    write_crs(os.path.join(root, "level_0", "20160601000000", "pab1.crs"), PAB1_L0)
    write_crs(os.path.join(root, "level_5", "20160601171200", "pab1.crs"), PAB1_L5)
    write_crs(os.path.join(root, "level_5", "20160601171200", "xaud.crs"), XAUD)
    if second_l5:
        write_crs(os.path.join(root, "level_5", "20160601180000", "pab1.crs"), PAB1_L5B)
        write_crs(os.path.join(root, "level_5", "20160601180000", "xaud.crs"), XAUD2)
    return root
