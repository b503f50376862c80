"""Engine-level reusable column functions (the public expression API).

Everything here is a pure Column→Column builder usable in any query:
cross-engine-exact aggregation helpers, text/fingerprint expressions,
and the standardizer's sizing math. Operators compose these; users of
the engine import from here.
"""

from etlalchemy_spark.queries._util import (  # noqa: F401
    davg,
    dec,
    dsum,
    one,
    sql_davg,
    sql_dsum,
    ts,
)
from etlalchemy_spark.operators.standardize import next_pow2  # noqa: F401
from etlalchemy_spark.operators.text import (  # noqa: F401
    bpe_ish_token_count,
    lang_id,
    md5_fingerprint,
    normalize_text,
    quality_features,
    quality_score,
    shingle_min_fingerprint,
    token_count,
)
from etlalchemy_spark.operators.asof import asof_join  # noqa: F401
from etlalchemy_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash,
    word_shingles,
)
from etlalchemy_spark.operators.graph import connected_components  # noqa: F401
from etlalchemy_spark.operators.scd import scd2_init, scd2_merge  # noqa: F401
from etlalchemy_spark.operators.similarity import (  # noqa: F401
    cosine_topk_exact,
    cosine_topk_lsh,
    cosine_topk_lsh_multiprobe,
    ivf_topk,
    kmeans_centroids,
)
from etlalchemy_spark.operators.skew import salted_aggregate, salted_join, with_salt  # noqa: F401
from etlalchemy_spark.operators.dedup import (  # noqa: F401
    md5_prefix60,
    minhash_lsh_pairs_exact,
    minhash_signature_exact,
    simhash_exact,
)
from etlalchemy_spark.operators.layout import zorder_value, zorder_write  # noqa: F401
from etlalchemy_spark.operators.prefix import (  # noqa: F401
    global_ranks,
    running_global_max,
    running_global_sum,
)
from etlalchemy_spark.operators.sampling import (  # noqa: F401
    bernoulli_sample,
    fixed_size_per_group,
    hash_bucket,
    stratified_sample,
)
from etlalchemy_spark.operators.sketch import (  # noqa: F401
    hll_estimate,
    hll_merge,
    hll_registers,
)
from etlalchemy_spark.operators.bloom import bloom_build, bloom_probe  # noqa: F401
from etlalchemy_spark.operators.ddl import (  # noqa: F401
    DDLEpilogue,
    FKSpec,
    IndexSpec,
    create_table_ddl,
    fk_orphan_count,
    fk_orphans,
)
from etlalchemy_spark.operators.graph import pagerank_exact  # noqa: F401
from etlalchemy_spark.operators.sampling import weighted_systematic_sample  # noqa: F401
from etlalchemy_spark.operators.sketch import (  # noqa: F401
    bitmap_buckets,
    bitmap_distinct_count,
    cms_estimate,
    cms_merge,
    cms_registers,
    hist_bins,
    hist_quantiles,
)
