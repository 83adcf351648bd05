-- Stage 0: CDC repair (reference 0-merge_delete_query.sql semantics).
-- Tombstones ({delete_value} rows) are resurrected with the payload of the
-- latest non-deleted version at-or-before their timestamp; duplicate
-- (key, ts) tombstones collapse via the rank partition (reference tie rule).
--
-- Written with inline subqueries rather than WITH: Spark 4.1's
-- PushdownPredicatesAndPruneColumnsForCTEDef mishandles CTE-bearing plans
-- stored in temp views and referenced from further CTE-bearing queries
-- (CTE-id collision), and this pipeline stacks three templated views.
select
    user_id, event_type, ts, {extra_columns_wo_prefix}
from (
    select
        a.user_id, a.event_type, a.ts, {extra_columns_with_prefix},
        row_number() OVER (PARTITION BY a.user_id, a.ts ORDER BY b.ts DESC, b.event_id DESC) as rank
    from (
        select user_id, event_type, ts
        from {cdc_view}
        where event_type = '{delete_value}'
    ) a
    inner join (
        select user_id, ts, {extra_columns_wo_prefix}
        from {cdc_view}
        where event_type != '{delete_value}'
    ) b
        on a.user_id = b.user_id
        and a.ts >= b.ts
)
where rank = 1

union all

select
    user_id, event_type, ts, {extra_columns_wo_prefix}
from {cdc_view}
where event_type != '{delete_value}'
