"""CLI job runner — reference A11 (bin/job.rb) parity.

    python -m llm_batch_processor_spark.job.cli <job.yml> [--input PATH]
        [--output PATH] [--backend openai|mock]

Contract parity (bin/job.rb:6-24, spec/bin_job_spec.rb):
- exactly one job file; usage to stderr + exit 1 on bad args;
- missing/invalid job file or referenced template -> stderr + exit 1;
- per-record errors (bad JSON lines, API failures) -> stderr, record
  skipped, exit 0;
- JSONL in (stdin by default) -> JSONL out (stdout by default).

stdout mode streams via toLocalIterator (constant driver memory); with
``--output`` the write is a fully distributed ``df.write.json``.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

USAGE = "Usage: python -m llm_batch_processor_spark.job.cli <job.yml> [--input PATH] [--output PATH]"


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(usage=USAGE, add_help=True)
    ap.add_argument("job_yml")
    ap.add_argument("--input", default=None, help="input JSONL path (default: stdin)")
    ap.add_argument("--output", default=None, help="output dir for distributed JSONL (default: stdout)")
    ap.add_argument("--backend", default="openai", choices=["openai", "mock"])
    ap.add_argument("--master", default=None)
    try:
        args = ap.parse_args(argv)
    except SystemExit:
        print(USAGE, file=sys.stderr)
        return 1

    from .spec import JobSpec, JobSpecError

    try:
        spec = JobSpec.from_yaml(args.job_yml)
    except JobSpecError as e:
        print(f"Error: {e}", file=sys.stderr)
        return 1
    except Exception as e:  # YAML parse errors etc. — config-time: abort
        print(f"Error: {e}", file=sys.stderr)
        return 1

    from pyspark.sql import functions as F

    from ..session import get_spark
    from ..sources.jsonl import ORDER_COL, read_records, to_jsonl_column, write_records
    from .backend import MockChatBackend, OpenAIChatBackend
    from .pipeline import llm_map

    backend = (
        MockChatBackend()
        if args.backend == "mock"
        else OpenAIChatBackend(spec.backend_endpoint, api_key=os.environ.get("OPENAI_API_KEY"))
    )

    tmp = None
    in_path = args.input
    if in_path is None:
        # stdin -> spool to a temp file so Spark can split/parallelize it
        tmp = tempfile.NamedTemporaryFile("w", suffix=".jsonl", delete=False, encoding="utf-8")
        for line in sys.stdin:
            tmp.write(line)
        tmp.close()
        in_path = tmp.name

    spark = get_spark(app_name=f"llm-job-{spec.id}", master=args.master)
    try:
        # stdout mode preserves INPUT ORDER (the reference's sequential
        # loop emits in order, pinned by spec/bin_job_spec.rb:98-107);
        # the distributed --output sink stays unordered, as a 100 TB
        # directory sink should be
        stdout_mode = not args.output
        good, corrupt = read_records(spark, in_path, keep_order=stdout_mode)
        for row in corrupt.toLocalIterator():
            print(f"Error: skipping malformed JSON line: {row['raw'][:200]}", file=sys.stderr)

        result = llm_map(good, spec, backend)
        # cache before the ok/errors split: each sink would otherwise
        # re-execute the nondeterministic inference UDF over every
        # record (2x real LLM calls, and a transiently failing backend
        # could drop a record from BOTH outputs or emit it twice)
        out = result.df.cache()
        try:
            ok = out.filter(F.col("error").isNull()).drop("error")
            errs = out.filter(F.col("error").isNotNull())

            if args.output:
                write_records(ok, args.output)
            else:
                for row in to_jsonl_column(ok.orderBy(ORDER_COL)).toLocalIterator():
                    print(row["line"])
            for row in errs.select("id", "error").toLocalIterator():
                print(f"Error: record id={row['id']}: {row['error']}", file=sys.stderr)
        finally:
            out.unpersist()
        return 0
    finally:
        spark.stop()
        if tmp is not None:
            os.unlink(tmp.name)


if __name__ == "__main__":
    sys.exit(main())
