"""The full query registry — every implemented pipeline/operator from
SURVEY.md §2 + the training-data suite, as ``name -> (callable, oracle_sql)``.

Shared by the driver contract (``__ray_entry__.py``) and the CLI
(``python -m scrapy_ray query``). The callable takes an sf_dir (a directory
of testdata parquet tables) and returns a Dataset / DataFrame / Table;
``oracle_sql`` is the equivalent DuckDB SQL (None for non-SQL-expressible
ops — stateful crawl semantics, sketch bounds, recall-pinned ANN paths).
"""

from __future__ import annotations


def full_registry() -> dict[str, tuple]:
    from scrapy_ray.pipelines.crawl_queries import CRAWL_QUERIES
    from scrapy_ray.pipelines.multimodal import MULTIMODAL_QUERIES
    from scrapy_ray.pipelines.queries import QUERIES
    from scrapy_ray.pipelines.queries2 import QUERIES2
    from scrapy_ray.pipelines.queries3 import QUERIES3
    from scrapy_ray.pipelines.queries4 import QUERIES4
    from scrapy_ray.pipelines.queries5 import QUERIES5
    from scrapy_ray.pipelines.queries6 import QUERIES6
    from scrapy_ray.pipelines.queries7 import QUERIES7
    from scrapy_ray.pipelines.queries8 import QUERIES8
    from scrapy_ray.pipelines.queries9 import QUERIES9
    from scrapy_ray.pipelines.queries10 import QUERIES10
    from scrapy_ray.pipelines.queries11 import QUERIES11
    from scrapy_ray.pipelines.queries12 import QUERIES12
    from scrapy_ray.pipelines.queries13 import QUERIES13
    from scrapy_ray.pipelines.queries14 import QUERIES14
    from scrapy_ray.pipelines.queries15 import QUERIES15
    from scrapy_ray.pipelines.queries16 import QUERIES16
    from scrapy_ray.pipelines.queries17 import QUERIES17
    from scrapy_ray.pipelines.queries18 import QUERIES18
    from scrapy_ray.pipelines.queries19 import QUERIES19
    from scrapy_ray.pipelines.queries20 import QUERIES20
    from scrapy_ray.pipelines.queries21 import QUERIES21
    from scrapy_ray.pipelines.queries22 import QUERIES22
    from scrapy_ray.pipelines.queries23 import QUERIES23
    from scrapy_ray.pipelines.queries24 import QUERIES24
    from scrapy_ray.pipelines.queries25 import QUERIES25
    from scrapy_ray.pipelines.queries26 import QUERIES26
    from scrapy_ray.pipelines.queries27 import QUERIES27
    from scrapy_ray.pipelines.queries28 import QUERIES28
    from scrapy_ray.pipelines.queries29 import QUERIES29
    from scrapy_ray.pipelines.queries30 import QUERIES30
    from scrapy_ray.pipelines.queries31 import QUERIES31
    from scrapy_ray.pipelines.queries32 import QUERIES32
    from scrapy_ray.pipelines.queries33 import QUERIES33
    from scrapy_ray.pipelines.queries34 import QUERIES34
    from scrapy_ray.pipelines.queries35 import QUERIES35
    from scrapy_ray.pipelines.queries36 import QUERIES36
    from scrapy_ray.pipelines.queries37 import QUERIES37
    from scrapy_ray.pipelines.queries38 import QUERIES38
    from scrapy_ray.pipelines.queries39 import QUERIES39
    from scrapy_ray.pipelines.queries40 import QUERIES40
    from scrapy_ray.pipelines.queries41 import QUERIES41
    from scrapy_ray.pipelines.queries42 import QUERIES42
    from scrapy_ray.pipelines.queries43 import QUERIES43
    from scrapy_ray.pipelines.queries44 import QUERIES44
    from scrapy_ray.pipelines.queries45 import QUERIES45
    from scrapy_ray.pipelines.queries46 import QUERIES46
    from scrapy_ray.pipelines.queries47 import QUERIES47
    from scrapy_ray.pipelines.queries48 import QUERIES48
    from scrapy_ray.pipelines.queries49 import QUERIES49
    from scrapy_ray.pipelines.queries50 import QUERIES50
    from scrapy_ray.pipelines.queries51 import QUERIES51
    from scrapy_ray.pipelines.queries52 import QUERIES52
    from scrapy_ray.pipelines.queries53 import QUERIES53
    from scrapy_ray.pipelines.queries54 import QUERIES54
    from scrapy_ray.pipelines.queries55 import QUERIES55
    from scrapy_ray.pipelines.queries56 import QUERIES56
    from scrapy_ray.pipelines.queries57 import QUERIES57
    from scrapy_ray.pipelines.queries58 import QUERIES58
    from scrapy_ray.pipelines.queries59 import QUERIES59
    from scrapy_ray.pipelines.queries60 import QUERIES60
    from scrapy_ray.pipelines.queries61 import QUERIES61
    from scrapy_ray.pipelines.queries62 import QUERIES62
    from scrapy_ray.pipelines.queries63 import QUERIES63
    from scrapy_ray.pipelines.queries64 import QUERIES64
    from scrapy_ray.pipelines.queries65 import QUERIES65
    from scrapy_ray.pipelines.queries66 import QUERIES66
    from scrapy_ray.pipelines.queries67 import QUERIES67
    from scrapy_ray.pipelines.queries68 import QUERIES68
    from scrapy_ray.pipelines.queries69 import QUERIES69
    from scrapy_ray.pipelines.queries70 import QUERIES70
    from scrapy_ray.pipelines.queries71 import QUERIES71
    from scrapy_ray.pipelines.queries72 import QUERIES72
    from scrapy_ray.pipelines.queries73 import QUERIES73
    from scrapy_ray.pipelines.queries74 import QUERIES74
    from scrapy_ray.pipelines.queries75 import QUERIES75
    from scrapy_ray.pipelines.queries76 import QUERIES76
    from scrapy_ray.pipelines.queries77 import QUERIES77
    from scrapy_ray.pipelines.queries78 import QUERIES78
    from scrapy_ray.pipelines.queries79 import QUERIES79
    from scrapy_ray.pipelines.queries80 import QUERIES80
    from scrapy_ray.pipelines.queries81 import QUERIES81
    from scrapy_ray.pipelines.queries82 import QUERIES82
    from scrapy_ray.pipelines.queries83 import QUERIES83
    from scrapy_ray.pipelines.queries84 import QUERIES84
    from scrapy_ray.pipelines.queries85 import QUERIES85
    from scrapy_ray.pipelines.queries86 import QUERIES86
    from scrapy_ray.pipelines.queries87 import QUERIES87
    from scrapy_ray.pipelines.queries88 import QUERIES88
    from scrapy_ray.pipelines.queries89 import QUERIES89
    from scrapy_ray.pipelines.queries90 import QUERIES90
    from scrapy_ray.pipelines.queries91 import QUERIES91
    from scrapy_ray.pipelines.queries92 import QUERIES92
    from scrapy_ray.pipelines.queries93 import QUERIES93
    from scrapy_ray.pipelines.queries94 import QUERIES94
    from scrapy_ray.pipelines.queries95 import QUERIES95
    from scrapy_ray.pipelines.queries96 import QUERIES96
    from scrapy_ray.pipelines.queries97 import QUERIES97
    from scrapy_ray.pipelines.queries98 import QUERIES98
    from scrapy_ray.pipelines.queries99 import QUERIES99
    from scrapy_ray.pipelines.queries100 import QUERIES100
    from scrapy_ray.pipelines.queries101 import QUERIES101
    from scrapy_ray.pipelines.queries102 import QUERIES102
    from scrapy_ray.pipelines.queries103 import QUERIES103
    from scrapy_ray.pipelines.queries104 import QUERIES104
    from scrapy_ray.pipelines.queries105 import QUERIES105
    from scrapy_ray.pipelines.queries106 import QUERIES106
    from scrapy_ray.pipelines.queries107 import QUERIES107
    from scrapy_ray.pipelines.queries108 import QUERIES108
    from scrapy_ray.pipelines.queries109 import QUERIES109
    from scrapy_ray.pipelines.queries110 import QUERIES110
    from scrapy_ray.pipelines.queries111 import QUERIES111
    from scrapy_ray.pipelines.queries112 import QUERIES112
    from scrapy_ray.pipelines.queries113 import QUERIES113
    from scrapy_ray.pipelines.queries114 import QUERIES114
    from scrapy_ray.pipelines.queries115 import QUERIES115
    from scrapy_ray.pipelines.queries116 import QUERIES116
    from scrapy_ray.pipelines.queries117 import QUERIES117
    from scrapy_ray.pipelines.queries118 import QUERIES118
    from scrapy_ray.pipelines.queries119 import QUERIES119
    from scrapy_ray.pipelines.queries120 import QUERIES120
    from scrapy_ray.pipelines.queries121 import QUERIES121
    from scrapy_ray.pipelines.queries122 import QUERIES122
    from scrapy_ray.pipelines.queries123 import QUERIES123
    from scrapy_ray.pipelines.queries124 import QUERIES124
    from scrapy_ray.pipelines.queries125 import QUERIES125
    from scrapy_ray.pipelines.queries126 import QUERIES126
    from scrapy_ray.pipelines.queries127 import QUERIES127
    from scrapy_ray.pipelines.queries128 import QUERIES128
    from scrapy_ray.pipelines.queries129 import QUERIES129
    from scrapy_ray.pipelines.queries130 import QUERIES130
    from scrapy_ray.pipelines.queries131 import QUERIES131
    from scrapy_ray.pipelines.queries132 import QUERIES132
    from scrapy_ray.pipelines.queries133 import QUERIES133
    from scrapy_ray.pipelines.queries134 import QUERIES134
    from scrapy_ray.pipelines.queries135 import QUERIES135
    from scrapy_ray.pipelines.queries136 import QUERIES136
    from scrapy_ray.pipelines.queries137 import QUERIES137
    from scrapy_ray.pipelines.queries138 import QUERIES138
    from scrapy_ray.pipelines.queries139 import QUERIES139
    from scrapy_ray.pipelines.queries140 import QUERIES140
    from scrapy_ray.pipelines.queries141 import QUERIES141
    from scrapy_ray.pipelines.queries142 import QUERIES142
    from scrapy_ray.pipelines.queries143 import QUERIES143
    from scrapy_ray.pipelines.queries144 import QUERIES144
    from scrapy_ray.pipelines.queries145 import QUERIES145
    from scrapy_ray.pipelines.queries146 import QUERIES146
    from scrapy_ray.pipelines.queries147 import QUERIES147
    from scrapy_ray.pipelines.queries148 import QUERIES148
    from scrapy_ray.pipelines.queries149 import QUERIES149
    from scrapy_ray.pipelines.queries150 import QUERIES150
    from scrapy_ray.pipelines.queries151 import QUERIES151
    from scrapy_ray.pipelines.queries152 import QUERIES152
    from scrapy_ray.pipelines.queries153 import QUERIES153
    from scrapy_ray.pipelines.queries154 import QUERIES154
    from scrapy_ray.pipelines.queries155 import QUERIES155
    from scrapy_ray.pipelines.queries156 import QUERIES156
    from scrapy_ray.pipelines.queries157 import QUERIES157
    from scrapy_ray.pipelines.queries158 import QUERIES158
    from scrapy_ray.pipelines.queries159 import QUERIES159
    from scrapy_ray.pipelines.queries160 import QUERIES160
    from scrapy_ray.pipelines.queries161 import QUERIES161
    from scrapy_ray.pipelines.queries162 import QUERIES162
    from scrapy_ray.pipelines.queries163 import QUERIES163
    from scrapy_ray.pipelines.queries164 import QUERIES164
    from scrapy_ray.pipelines.queries165 import QUERIES165
    from scrapy_ray.pipelines.queries166 import QUERIES166
    from scrapy_ray.pipelines.queries167 import QUERIES167
    from scrapy_ray.pipelines.queries168 import QUERIES168
    from scrapy_ray.pipelines.queries169 import QUERIES169
    from scrapy_ray.pipelines.queries170 import QUERIES170
    from scrapy_ray.pipelines.queries171 import QUERIES171
    from scrapy_ray.pipelines.queries172 import QUERIES172
    from scrapy_ray.pipelines.queries173 import QUERIES173
    from scrapy_ray.pipelines.queries174 import QUERIES174
    from scrapy_ray.pipelines.queries175 import QUERIES175
    from scrapy_ray.pipelines.queries176 import QUERIES176
    from scrapy_ray.pipelines.queries177 import QUERIES177
    from scrapy_ray.pipelines.queries178 import QUERIES178
    from scrapy_ray.pipelines.queries179 import QUERIES179
    from scrapy_ray.pipelines.queries180 import QUERIES180
    from scrapy_ray.pipelines.queries181 import QUERIES181
    from scrapy_ray.pipelines.queries182 import QUERIES182
    from scrapy_ray.pipelines.queries183 import QUERIES183
    from scrapy_ray.pipelines.queries184 import QUERIES184
    from scrapy_ray.pipelines.queries185 import QUERIES185
    from scrapy_ray.pipelines.queries186 import QUERIES186
    from scrapy_ray.pipelines.queries187 import QUERIES187
    from scrapy_ray.pipelines.queries188 import QUERIES188
    from scrapy_ray.pipelines.queries189 import QUERIES189
    from scrapy_ray.pipelines.queries190 import QUERIES190
    from scrapy_ray.pipelines.queries191 import QUERIES191
    from scrapy_ray.pipelines.queries192 import QUERIES192
    from scrapy_ray.pipelines.queries193 import QUERIES193
    from scrapy_ray.pipelines.queries194 import QUERIES194
    from scrapy_ray.pipelines.queries195 import QUERIES195
    from scrapy_ray.pipelines.queries196 import QUERIES196
    from scrapy_ray.pipelines.queries197 import QUERIES197
    from scrapy_ray.pipelines.queries198 import QUERIES198
    from scrapy_ray.pipelines.queries199 import QUERIES199
    from scrapy_ray.pipelines.queries200 import QUERIES200
    from scrapy_ray.pipelines.queries201 import QUERIES201
    from scrapy_ray.pipelines.queries202 import QUERIES202
    from scrapy_ray.pipelines.queries203 import QUERIES203
    from scrapy_ray.pipelines.queries204 import QUERIES204
    from scrapy_ray.pipelines.skew import SKEW_QUERIES
    from scrapy_ray.pipelines.textqual import TEXTQUAL_QUERIES
    from scrapy_ray.pipelines.training import TRAINING_QUERIES

    reg: dict[str, tuple] = {}
    for part in (QUERIES, QUERIES2, QUERIES3, QUERIES4, QUERIES5, QUERIES6,
                 QUERIES7, QUERIES8, QUERIES9, QUERIES10, QUERIES11,
                 QUERIES12, QUERIES13, QUERIES14, QUERIES15, QUERIES16,
                 QUERIES17, QUERIES18, QUERIES19, QUERIES20, QUERIES21,
                 QUERIES22, QUERIES23, QUERIES24, QUERIES25, QUERIES26,
                 QUERIES27, QUERIES28, QUERIES29, QUERIES30, QUERIES31,
                 QUERIES32, QUERIES33, QUERIES34, QUERIES35, QUERIES36,
                 QUERIES37, QUERIES38, QUERIES39, QUERIES40, QUERIES41, QUERIES42,
                 QUERIES43, QUERIES44, QUERIES45, QUERIES46, QUERIES47,
                 QUERIES48, QUERIES49, QUERIES50, QUERIES51, QUERIES52, QUERIES53, QUERIES54, QUERIES55, QUERIES56,
                 QUERIES57, QUERIES58, QUERIES59, QUERIES60, QUERIES61, QUERIES62,
                 QUERIES63, QUERIES64, QUERIES65, QUERIES66, QUERIES67, QUERIES68,
                 QUERIES69, QUERIES70, QUERIES71, QUERIES72, QUERIES73, QUERIES74, QUERIES75, QUERIES76, QUERIES77, QUERIES78, QUERIES79, QUERIES80, QUERIES81, QUERIES82, QUERIES83, QUERIES84, QUERIES85, QUERIES86, QUERIES87, QUERIES88, QUERIES89, QUERIES90, QUERIES91, QUERIES92, QUERIES93, QUERIES94, QUERIES95, QUERIES96, QUERIES97, QUERIES98, QUERIES99, QUERIES100, QUERIES101, QUERIES102, QUERIES103, QUERIES104, QUERIES105, QUERIES106, QUERIES107, QUERIES108, QUERIES109, QUERIES110, QUERIES111, QUERIES112, QUERIES113, QUERIES114, QUERIES115, QUERIES116, QUERIES117, QUERIES118, QUERIES119, QUERIES120, QUERIES121, QUERIES122, QUERIES123, QUERIES124, QUERIES125, QUERIES126, QUERIES127, QUERIES128, QUERIES129, QUERIES130, QUERIES131, QUERIES132, QUERIES133, QUERIES134, QUERIES135, QUERIES136, QUERIES137, QUERIES138, QUERIES139, QUERIES140, QUERIES141, QUERIES142, QUERIES143, QUERIES144, QUERIES145, QUERIES146, QUERIES147, QUERIES148, QUERIES149, QUERIES150, QUERIES151, QUERIES152, QUERIES153, QUERIES154, QUERIES155, QUERIES156, QUERIES157, QUERIES158, QUERIES159, QUERIES160, QUERIES161, QUERIES162, QUERIES163, QUERIES164, QUERIES165, QUERIES166, QUERIES167, QUERIES168, QUERIES169, QUERIES170, QUERIES171, QUERIES172, QUERIES173, QUERIES174, QUERIES175, QUERIES176, QUERIES177, QUERIES178, QUERIES179, QUERIES180, QUERIES181, QUERIES182, QUERIES183, QUERIES184, QUERIES185, QUERIES186, QUERIES187, QUERIES188, QUERIES189, QUERIES190, QUERIES191, QUERIES192, QUERIES193, QUERIES194, QUERIES195, QUERIES196, QUERIES197, QUERIES198, QUERIES199, QUERIES200, QUERIES201, QUERIES202, QUERIES203, QUERIES204,
                 TRAINING_QUERIES, TEXTQUAL_QUERIES, MULTIMODAL_QUERIES,
                 SKEW_QUERIES, CRAWL_QUERIES):
        reg.update(part)
    return reg
