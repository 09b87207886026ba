"""tantivy_tpu — a TPU-native full-text search engine.

Public API parity with reference `src/lib.rs:215-344` re-exports. See
SURVEY.md for the layer map and README.md for the design stance: host (Python,
C++ planned) handles tokenization / segment build / lifecycle; the scoring
read path runs on TPU via JAX/Pallas with queries batched per core.
"""

from .schema import (  # noqa: F401
    FAST,
    INDEXED,
    STORED,
    STORED_TEXT,
    STRING,
    TEXT,
    Document,
    FieldType,
    IndexRecordOption,
    NumericOptions,
    Schema,
    SchemaBuilder,
    Term,
    TextOptions,
)
from .index import Index, IndexReader, IndexSettings, ReloadPolicy, Warmer  # noqa: F401
from .indexer import IndexWriter, PreparedCommit  # noqa: F401
from .indexer.merge_policy import LogMergePolicy, MergePolicy, NoMergePolicy  # noqa: F401
from .searcher import DocAddress, Searcher  # noqa: F401
from .collector import (  # noqa: F401
    Collector,
    Count,
    DocSetCollector,
    FilterCollector,
    HistogramCollector,
    MultiCollector,
    TopDocs,
)
from .collector.sort_key import (  # noqa: F401
    SortByCallable,
    SortByFastField,
    SortByScore,
)
from .query import (  # noqa: F401
    AllQuery,
    BooleanQuery,
    BoostQuery,
    ConstScoreQuery,
    DisjunctionMaxQuery,
    EmptyQuery,
    ExistsQuery,
    FuzzyTermQuery,
    MoreLikeThisQuery,
    Occur,
    PhrasePrefixQuery,
    PhraseQuery,
    Query,
    RangeQuery,
    RegexQuery,
    TermQuery,
    TermSetQuery,
)
from .postings.format import TERMINATED  # noqa: F401
from .query.phrase_query import RegexPhraseQuery  # noqa: F401
from .query.explanation import DoesNotMatchError, Explanation  # noqa: F401
from .query.parser import QueryParser, QueryParserError  # noqa: F401
from .aggregation import AggregationCollector, AggregationLimits  # noqa: F401
from .collector.facet_collector import Facet, FacetCollector  # noqa: F401
from .snippet import Snippet, SnippetGenerator  # noqa: F401
from .executor import Executor  # noqa: F401
from .parallel import BatchExecutor  # noqa: F401

__version__ = "0.1.0"


def version_string() -> str:
    return f"tantivy_tpu v{__version__}"


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (kills multi-minute warmup
    when device compiles go over a slow link). Call before first device use."""
    import os

    import jax

    cache_dir = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
