from findb_spark.sources.findb_file import (  # noqa: F401
    FindbDataSource,
    descend,
    export_prices_db,
    read_prices_db,
    write_btree_file,
)
