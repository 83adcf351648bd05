-- Stage 3: newer-version-exists detection, invalid-id anti filter, and the
-- month-window price-change history (reference 3-basedata_df_final_query.sql
-- semantics). Inline subqueries instead of WITH — see 0-merge_delete.sql
-- header; the invalid-id subquery therefore appears in both branches.
select {final_columns}, 'current' as price_src from (
    select
        *,
        row_number() OVER (PARTITION BY user_id, value
            ORDER BY ts DESC, event_id DESC, event_type DESC) as rank
    from {base2_view}
    where
        user_id not in (
            select user_id from (
                select
                    user_id,
                    max(case when event_type = 'purchase' then ts end) as f_max,
                    max(ts) as all_max
                from {base2_view}
                group by user_id
            )
            where f_max < all_max
        )
        and ts >= timestamp '{month_start}'
        and ts < timestamp '{month_end}'
)
where rank = 1

union all

select {final_columns}, 'previous' as price_src from (
    select
        *,
        row_number() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC, event_type DESC) as rank
    from {base2_view}
    where
        user_id not in (
            select user_id from (
                select
                    user_id,
                    max(case when event_type = 'purchase' then ts end) as f_max,
                    max(ts) as all_max
                from {base2_view}
                group by user_id
            )
            where f_max < all_max
        )
        and ts < timestamp '{month_start}'
)
where rank = 1
