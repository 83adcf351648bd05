-- Stage 1: latest version per (entity, day) + enrichment join + the
-- per-iteration loop filter (reference 1-basedata_first_query.sql
-- semantics: the geoid/distribution filter lives in THIS query).
-- Inline subqueries instead of WITH — see 0-merge_delete.sql header.
select
    l.user_id, l.event_type, l.ts, {extra_columns_l_prefix},
    c.c_name, c.c_mktsegment
from (
    select user_id, event_type, ts, {extra_columns_wo_prefix}
    from (
        select
            *,
            row_number() OVER (PARTITION BY user_id, to_date(ts)
                ORDER BY ts DESC, event_id DESC, event_type DESC) as rank
        from {repaired_view}
    )
    where rank = 1
) l
left join {customer_view} c
    on l.user_id = c.c_custkey
where {iteration_filter}
