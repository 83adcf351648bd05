-- Stage 2: activity filter + control argmax + counter joins (reference
-- 2-basedata_df_query.sql semantics: separate scans per statistic family,
-- each joined onto the base — the DataFrame pipeline fuses these into one
-- conditional aggregation; the SQL path keeps the reference's layout).
-- Inline subqueries instead of WITH — see 0-merge_delete.sql header.
select
    b.*,
    ctl.last_signup_value,
    cast(coalesce(ck.n_clicks, 0) as bigint) as n_clicks,
    coalesce(ck.click_value, 0) as click_value,
    cast(coalesce(vw.n_views, 0) as bigint) as n_views
from {base1_view} b
inner join (
    select distinct o_custkey as user_id
    from {orders_view}
    where
        o_orderdate >= timestamp '{activity_from}'
        and o_orderdate < timestamp '{activity_to}'
) a on b.user_id = a.user_id
left join (
    select
        user_id,
        (max(named_struct('o0', ts, 'o1', event_id, 'v', value))).v as last_signup_value
    from {cdc_view}
    where event_type = 'signup'
    group by user_id
) ctl on b.user_id = ctl.user_id
left join (
    select
        user_id,
        count(*) as n_clicks,
        sum(coalesce(value, 0)) as click_value
    from {cdc_view}
    where event_type = 'click'
    group by user_id
) ck on b.user_id = ck.user_id
left join (
    select
        user_id,
        count(*) as n_views
    from {cdc_view}
    where event_type = 'view'
    group by user_id
) vw on b.user_id = vw.user_id
